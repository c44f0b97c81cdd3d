"""Named matrix generators.

Reference: src/matrices/ (~60 generators, SURVEY §2.5): deterministic
classical/misc/pde/integral families + independent random families.

TPU-native form: every deterministic generator is an index-dependent
fill — one fused XLA expression over the padded sharded array (the
IndexDependentFill idiom, blas_like/level1/IndexDependentFill.hpp), so
generation runs at HBM bandwidth with zero host traffic. Random
families sample with the functional PRNG, sharded."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.grid import Grid
from ..core.random_ import SampleNormal, SampleUniform, next_key
from ..core.types import MC, MR
from ..blas.level1 import IndexDependentFill, Zero


def _empty(m, n, grid=None, dtype=jnp.float64) -> DistMatrix:
    g = grid or Grid.default()
    from ..core.dmatrix import padded_extent

    data = jnp.zeros((padded_extent(m, g), padded_extent(n, g)), dtype)
    return DistMatrix.from_padded(data, m, n, MC, MR, g)


def _fill(m, n, f, grid=None, dtype=jnp.float64) -> DistMatrix:
    return IndexDependentFill(_empty(m, n, grid, dtype), f)


# -- classical deterministic (src/matrices/deterministic/classical/) --------


def Zeros(m, n, grid=None, dtype=jnp.float64):
    return _empty(m, n, grid, dtype)


def Ones(m, n, grid=None, dtype=jnp.float64):
    return _fill(m, n, lambda i, j: jnp.ones(i.shape), grid, dtype)


def Identity(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: (i == j).astype(jnp.float64), grid, dtype)


def Diagonal(d, grid=None):
    d = jnp.asarray(d)
    n = d.shape[0]
    return _fill(n, n, lambda i, j: jnp.where(i == j, d[jnp.clip(i, 0, n - 1)],
                                              0.0), grid, d.dtype)


def Jordan(n, lam, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.where(i == j, lam, 0.0)
                 + jnp.where(j == i + 1, 1.0, 0.0), grid, dtype)


def Cauchy(x, y, grid=None):
    """C_ij = 1/(x_i - y_j) (reference: classical/Cauchy.cpp)."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    m, n = x.shape[0], y.shape[0]
    return _fill(m, n, lambda i, j: 1.0 / (x[jnp.clip(i, 0, m - 1)]
                                           - y[jnp.clip(j, 0, n - 1)]),
                 grid, x.dtype)


def CauchyLike(r, s, x, y, grid=None):
    r, s, x, y = map(jnp.asarray, (r, s, x, y))
    m, n = x.shape[0], y.shape[0]
    return _fill(m, n, lambda i, j: r[jnp.clip(i, 0, m - 1)]
                 * s[jnp.clip(j, 0, n - 1)]
                 / (x[jnp.clip(i, 0, m - 1)] - y[jnp.clip(j, 0, n - 1)]),
                 grid, x.dtype)


def Circulant(c, grid=None):
    c = jnp.asarray(c)
    n = c.shape[0]
    return _fill(n, n, lambda i, j: c[jnp.mod(i - j, n)], grid, c.dtype)


def Fourier(n, grid=None):
    """Unitary DFT matrix (reference: classical/Fourier.cpp)."""
    scale = 1.0 / math.sqrt(n)

    def f(i, j):
        theta = -2.0 * jnp.pi * (i.astype(jnp.float64) * j) / n
        return scale * (jnp.cos(theta) + 1j * jnp.sin(theta))

    return _fill(n, n, f, grid, jnp.complex128)


def GCDMatrix(m, n, grid=None, dtype=jnp.float64):
    return _fill(m, n, lambda i, j: jnp.gcd(i + 1, j + 1).astype(jnp.float64),
                 grid, dtype)


def Hankel(m, n, a, grid=None):
    a = jnp.asarray(a)
    return _fill(m, n, lambda i, j: a[jnp.clip(i + j, 0, a.shape[0] - 1)],
                 grid, a.dtype)


def Hilbert(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: 1.0 / (i + j + 1.0), grid, dtype)


def MinIJ(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.minimum(i, j) + 1.0, grid, dtype)


def Toeplitz(m, n, a, grid=None):
    """a indexed as [col-row + m - 1]... reference stores first column +
    first row; here a has length m+n-1, entry (i,j) = a[i - j + n - 1]."""
    a = jnp.asarray(a)
    return _fill(m, n, lambda i, j: a[jnp.clip(i - j + n - 1, 0,
                                               a.shape[0] - 1)], grid, a.dtype)


def OneTwoOne(n, grid=None, dtype=jnp.float64):
    """Tridiagonal [1,2,1] (reference: classical/OneTwoOne.cpp)."""
    return _fill(n, n, lambda i, j: jnp.where(i == j, 2.0, 0.0)
                 + jnp.where(jnp.abs(i - j) == 1, 1.0, 0.0), grid, dtype)


def Walsh(k, binary=False, grid=None, dtype=jnp.float64):
    """2^k x 2^k Walsh-Hadamard (reference: classical/Walsh.cpp)."""
    n = 2 ** k

    def f(i, j):
        bits = jnp.sum(jnp.stack([((i >> b) & 1) * ((j >> b) & 1)
                                  for b in range(k)]), axis=0) if k else 0
        val = 1.0 - 2.0 * (bits % 2) if k else jnp.ones(i.shape)
        if binary:
            val = (val + 1.0) / 2.0
        return val

    return _fill(n, n, f, grid, dtype)


def Wilkinson(k, grid=None, dtype=jnp.float64):
    """(2k+1)x(2k+1) Wilkinson test matrix (reference: classical/Wilkinson)."""
    n = 2 * k + 1
    return _fill(n, n, lambda i, j: jnp.where(i == j, jnp.abs(i - k) * 1.0, 0.0)
                 + jnp.where(jnp.abs(i - j) == 1, 1.0, 0.0), grid, dtype)


# -- misc deterministic (src/matrices/deterministic/misc/) ------------------


def Demmel(n, grid=None, dtype=jnp.float64):
    beta = 10.0 ** (4.0 / (n - 1)) if n > 1 else 1.0
    return _fill(n, n, lambda i, j: jnp.where(
        j >= i, -(beta ** (j - i).astype(jnp.float64)), 0.0), grid, dtype)


def DruinskyToledo(n, grid=None, dtype=jnp.float64):
    """GEPP growth example of Druinsky-Toledo (reference: misc/DruinskyToledo)."""
    def f(i, j):
        lower = jnp.where(j < i, -1.0, 0.0)
        diag = jnp.where(i == j, 1.0, 0.0)
        last = jnp.where((j == n - 1) & (i < n - 1), 1.0, 0.0)
        return lower + diag + last

    return _fill(n, n, f, grid, dtype)


def Ehrenfest(n, grid=None, dtype=jnp.float64):
    """Ehrenfest urn transition matrix (reference: misc/Ehrenfest.cpp)."""
    def f(i, j):
        up = jnp.where(j == i + 1, (n - 1.0 - i) / (n - 1.0), 0.0)
        dn = jnp.where(j == i - 1, i / (n - 1.0), 0.0)
        return up + dn

    return _fill(n, n, f, grid, dtype)


def ExtendedKahan(k, phi, mu, grid=None, dtype=jnp.float64):
    """Reference: misc/ExtendedKahan.cpp (3*2^k columns). Built densely
    host-side from its R S factors for clarity."""
    l = 2 ** k
    n = 3 * l
    zeta = math.sqrt(1.0 - phi * phi)
    s = np.power(zeta, np.arange(n))
    R = np.eye(n)
    R[: 2 * l, l:] *= 0
    # upper triangular with -phi off-diagonal in the leading blocks
    U = np.triu(-phi * np.ones((n, n)), 1) + np.eye(n)
    U[:, 2 * l:] *= 1.0
    A = np.diag(s) @ U
    A[:, 2 * l:] *= mu
    return DistMatrix.from_global(jnp.asarray(A, dtype), grid=grid)


def GEPPGrowth(n, grid=None, dtype=jnp.float64):
    """Wilkinson's worst-case GEPP growth matrix (reference: misc/GEPPGrowth)."""
    def f(i, j):
        low = jnp.where(j < i, -1.0, 0.0)
        diag = jnp.where(i == j, 1.0, 0.0)
        last = jnp.where((j == n - 1) & (i != n - 1), 1.0, 0.0)
        return low + diag + last

    return _fill(n, n, f, grid, dtype)


def Gear(n, i, j, grid=None, dtype=jnp.float64):
    ii, jj = i, j

    def f(r, c):
        off = jnp.where(jnp.abs(r - c) == 1, 1.0, 0.0)
        top = jnp.where((r == 0) & (c == jnp.abs(ii) - 1),
                        jnp.sign(ii) * 1.0, 0.0)
        bot = jnp.where((r == n - 1) & (c == n - jnp.abs(jj)),
                        jnp.sign(jj) * 1.0, 0.0)
        return off + top + bot

    return _fill(n, n, f, grid, dtype)


def Hanowa(n, mu, grid=None, dtype=jnp.float64):
    if n % 2:
        raise ValueError("Hanowa requires even n")
    h = n // 2

    def f(i, j):
        diag = jnp.where(i == j, mu * 1.0, 0.0)
        upper = jnp.where((j == i + h), -(i + 1.0), 0.0)
        lower = jnp.where((i == j + h), (j + 1.0), 0.0)
        return diag + upper + lower

    return _fill(n, n, f, grid, dtype)


def Kahan(n, phi, grid=None, dtype=jnp.float64):
    zeta = math.sqrt(1.0 - phi * phi)

    def f(i, j):
        zi = zeta ** i.astype(jnp.float64)
        return jnp.where(i == j, zi, jnp.where(j > i, -phi * zi, 0.0))

    return _fill(n, n, f, grid, dtype)


def KMS(n, rho, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: rho ** jnp.abs(i - j).astype(jnp.float64),
                 grid, dtype)


def Lauchli(n, mu, grid=None, dtype=jnp.float64):
    def f(i, j):
        top = jnp.where(i == 0, 1.0, 0.0)
        sub = jnp.where(i == j + 1, mu * 1.0, 0.0)
        return top + sub

    return _fill(n + 1, n, f, grid, dtype)


def Legendre(n, grid=None, dtype=jnp.float64):
    """Jacobi matrix of Legendre polynomials (reference: misc/Legendre.cpp)."""
    def beta(k):
        kk = k.astype(jnp.float64) + 1.0
        return 0.5 / jnp.sqrt(1.0 - 1.0 / (4.0 * kk * kk))

    def f(i, j):
        lo = jnp.where(j == i + 1, beta(i), 0.0)
        hi = jnp.where(i == j + 1, beta(j), 0.0)
        return lo + hi

    return _fill(n, n, f, grid, dtype)


def Lehmer(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: (jnp.minimum(i, j) + 1.0)
                 / (jnp.maximum(i, j) + 1.0), grid, dtype)


def Lotkin(n, grid=None, dtype=jnp.float64):
    def f(i, j):
        h = 1.0 / (i + j + 1.0)
        return jnp.where(i == 0, 1.0, h)

    return _fill(n, n, f, grid, dtype)


def Parter(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: 1.0 / (i - j + 0.5), grid, dtype)


def Pei(n, alpha, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.where(i == j, alpha + 1.0, 1.0),
                 grid, dtype)


def Redheffer(n, grid=None, dtype=jnp.float64):
    def f(i, j):
        first = jnp.where(j == 0, 1.0, 0.0)
        div = jnp.where(jnp.mod(j + 1, i + 1) == 0, 1.0, 0.0)
        return jnp.maximum(first, div)

    return _fill(n, n, f, grid, dtype)


def Riffle(n, grid=None, dtype=jnp.float64):
    """Riffle-shuffle transition matrix (reference: misc/Riffle.cpp)."""
    from jax.scipy.special import gammaln

    def binom(a, b):
        return jnp.exp(gammaln(a + 1.0) - gammaln(b + 1.0)
                       - gammaln(a - b + 1.0))

    def f(i, j):
        x = 2.0 * (j + 1.0) - (i + 1.0)
        val = binom(jnp.full(i.shape, float(n + 1)), x) / (2.0 ** n)
        valid = (x >= 0) & (x <= n + 1)
        return jnp.where(valid, val, 0.0)

    return _fill(n, n, f, grid, dtype)


def Ris(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: 0.5 / (n - i - j - 0.5), grid, dtype)


def TriW(n, alpha, k, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.where(i == j, 1.0, 0.0)
                 + jnp.where((j > i) & (j <= i + k), alpha * 1.0, 0.0),
                 grid, dtype)


def Grcar(n, k=3, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.where((j >= i) & (j <= i + k), 1.0,
                                              0.0)
                 + jnp.where(i == j + 1, -1.0, 0.0), grid, dtype)


def Whale(n, grid=None):
    """Whale pseudospectrum Toeplitz symbol (reference:
    sparse_toeplitz/Whale.cpp)."""
    c = np.zeros(2 * n - 1, dtype=np.complex128)
    # symbol coefficients: z^{-4},...,z^{3} band
    coef = {3: 1j, 2: 1.0, 1: -1j + 3.0, -1: -1.0 + 1j * 0,
            -2: -4.0, -3: -3 - 2j, -4: -1j * 2}
    for off, v in coef.items():
        idx = n - 1 + off
        if 0 <= idx < 2 * n - 1:
            c[idx] = v
    return Toeplitz(n, n, jnp.asarray(c))


def BullsHead(n, grid=None):
    """Bull's head Toeplitz (reference: sparse_toeplitz/BullsHead.cpp)."""
    c = np.zeros(2 * n - 1, dtype=np.complex128)
    for off, v in {1: 2j, -2: 1.0, -7: 0.7}.items():
        idx = n - 1 + off
        if 0 <= idx < 2 * n - 1:
            c[idx] = v
    return Toeplitz(n, n, jnp.asarray(c))


# -- pde (src/matrices/deterministic/pde/) ----------------------------------


def Laplacian1D(n, grid=None, dtype=jnp.float64):
    return _fill(n, n, lambda i, j: jnp.where(i == j, -2.0, 0.0)
                 + jnp.where(jnp.abs(i - j) == 1, 1.0, 0.0), grid, dtype)


def Laplacian(nx, ny=None, grid=None, dtype=jnp.float64):
    """2-D 5-point Laplacian on an nx x ny grid (reference: pde/Laplacian)."""
    if ny is None:
        return Laplacian1D(nx, grid, dtype)
    n = nx * ny

    def f(i, j):
        xi, yi = i % nx, i // nx
        xj, yj = j % nx, j // nx
        diag = jnp.where(i == j, -4.0, 0.0)
        horiz = jnp.where((yi == yj) & (jnp.abs(xi - xj) == 1), 1.0, 0.0)
        vert = jnp.where((xi == xj) & (jnp.abs(yi - yj) == 1), 1.0, 0.0)
        return diag + horiz + vert

    return _fill(n, n, f, grid, dtype)


def Helmholtz(nx, shift, ny=None, grid=None, dtype=jnp.float64):
    """-(Laplacian + shift I) discretisation (reference: pde/Helmholtz)."""
    L = Laplacian(nx, ny, grid, dtype)
    from ..blas.level1 import ShiftDiagonal, Scale

    return ShiftDiagonal(Scale(-1.0, L), -shift)


def FoxLi(n, omega=16 * math.pi, grid=None):
    """Fox-Li integral operator Gauss-Legendre discretisation
    (reference: integral/FoxLi.cpp)."""
    nodes, weights = np.polynomial.legendre.leggauss(n)
    x = jnp.asarray(nodes)
    w = jnp.asarray(weights)

    def f(i, j):
        xi = x[jnp.clip(i, 0, n - 1)]
        xj = x[jnp.clip(j, 0, n - 1)]
        phase = omega * (xi - xj) ** 2
        pref = jnp.sqrt(1j * omega / jnp.pi)
        return pref * jnp.exp(-1j * phase) * w[jnp.clip(j, 0, n - 1)]

    return _fill(n, n, f, grid, jnp.complex128)


# -- random (src/matrices/random/independent/ + misc) -----------------------


def Uniform(m, n, grid=None, dtype=jnp.float64, center=0.0, radius=1.0,
            key=None):
    g = grid or Grid.default()
    A = _empty(m, n, g, dtype)
    vals = SampleUniform(A.data.shape, dtype, center - radius,
                         center + radius, key=key)
    return A.with_data(A.mask_padding(vals))


def Gaussian(m, n, grid=None, dtype=jnp.float64, mean=0.0, stddev=1.0,
             key=None):
    g = grid or Grid.default()
    A = _empty(m, n, g, dtype)
    vals = SampleNormal(A.data.shape, dtype, mean, stddev, key=key)
    return A.with_data(A.mask_padding(vals))


def Bernoulli(m, n, p=0.5, grid=None, dtype=jnp.float64, key=None):
    g = grid or Grid.default()
    A = _empty(m, n, g, dtype)
    k = key if key is not None else next_key()
    vals = jax.random.bernoulli(k, p, A.data.shape).astype(dtype)
    return A.with_data(A.mask_padding(vals))


def Rademacher(m, n, grid=None, dtype=jnp.float64, key=None):
    g = grid or Grid.default()
    A = _empty(m, n, g, dtype)
    k = key if key is not None else next_key()
    vals = (2.0 * jax.random.bernoulli(k, 0.5, A.data.shape) - 1.0
            ).astype(dtype)
    return A.with_data(A.mask_padding(vals))


def ThreeValued(m, n, p=2.0 / 3.0, grid=None, dtype=jnp.float64, key=None):
    g = grid or Grid.default()
    A = _empty(m, n, g, dtype)
    k = key if key is not None else next_key()
    u = jax.random.uniform(k, A.data.shape)
    vals = jnp.where(u < p / 2, -1.0, jnp.where(u < p, 1.0, 0.0)).astype(dtype)
    return A.with_data(A.mask_padding(vals))


def Wigner(n, grid=None, dtype=jnp.float64, key=None):
    """GOE/GUE sample (reference: random/Wigner.cpp)."""
    from ..blas.level1 import MakeHermitian
    from ..core.types import LOWER

    G = Gaussian(n, n, grid, dtype, key=key)
    H = MakeHermitian(LOWER, G)
    return H.with_data(0.5 * (H.data + jnp.conj(H.data.T)))


def Haar(n, grid=None, dtype=jnp.float64, key=None):
    """Haar-distributed orthogonal/unitary matrix via QR of Gaussian
    (reference: random/Haar.cpp)."""
    from ..lapack.qr import ExplicitQR

    G = Gaussian(n, n, grid, dtype, key=key)
    Q, R = ExplicitQR(G)
    # fix phases so the distribution is exactly Haar
    d = jnp.diagonal(R.data)
    s = jnp.where(jnp.abs(d) == 0, 1.0, jnp.sign(jnp.real(d))).astype(Q.dtype)
    return Q.with_data(Q.data * s[None, : Q.data.shape[1]])


def HermitianUniformSpectrum(n, lower=0.0, upper=1.0, grid=None,
                             dtype=jnp.float64, key=None):
    """Q diag(U[lower,upper]) Q^H (reference: random/HermitianUniformSpectrum)."""
    from ..blas.level3 import HermitianFromEVD
    from ..core.types import LOWER

    k = key if key is not None else next_key()
    k1, k2 = jax.random.split(k)
    w = jax.random.uniform(k1, (n,), jnp.float64, lower, upper)
    Q = Haar(n, grid, dtype, key=k2)
    return HermitianFromEVD(LOWER, Q, w)


def NormalUniformSpectrum(n, center=0.0, radius=1.0, grid=None, key=None):
    """Normal matrix with eigenvalues uniform in a disc
    (reference: random/NormalUniformSpectrum.cpp)."""
    from ..blas.level3 import NormalFromEVD

    k = key if key is not None else next_key()
    k1, k2, k3 = jax.random.split(k, 3)
    r = radius * jnp.sqrt(jax.random.uniform(k1, (n,)))
    th = 2 * jnp.pi * jax.random.uniform(k2, (n,))
    w = center + r * jnp.exp(1j * th)
    Q = Haar(n, None if grid is None else grid, jnp.complex128, key=k3)
    return NormalFromEVD(Q, w)


def HatanoNelson(n, g_field=0.5, grid=None, dtype=jnp.float64, key=None):
    """Non-Hermitian Anderson model (reference: random/HatanoNelson.cpp)."""
    U = Uniform(n, n, grid, dtype, key=key)
    d = jnp.diagonal(U.data)

    def f(i, j):
        diag = jnp.where(i == j, d[jnp.clip(i, 0, d.shape[0] - 1)], 0.0)
        up = jnp.where(j == i + 1, math.exp(g_field), 0.0)
        dn = jnp.where(i == j + 1, math.exp(-g_field), 0.0)
        wrap_up = jnp.where((i == n - 1) & (j == 0), math.exp(g_field), 0.0)
        wrap_dn = jnp.where((i == 0) & (j == n - 1), math.exp(-g_field), 0.0)
        return diag + up + dn + wrap_up + wrap_dn

    return _fill(n, n, f, grid, dtype)


# -- lattice bases (src/matrices/random/lattice/) ----------------------------


def AjtaiTypeBasis(n, alpha, grid=None, dtype=jnp.float64, key=None):
    """Upper-triangular Ajtai-type lattice basis (reference:
    src/matrices/random/lattice/AjtaiTypeBasis.cpp:18-37; Nguyen & Stehle,
    "LLL on the Average" §3.4): diagonal d_j = round(2^((2n-j+1)^alpha)),
    entries above the diagonal uniform integers in [0, d_j/2) (floored,
    so the basis is integral as for the reference's integer types)."""
    k = key if key is not None else next_key()
    cols = jnp.arange(n, dtype=jnp.float64)
    d = jnp.round(jnp.exp2((2.0 * n - cols + 1.0) ** alpha))
    A = _empty(n, n, grid, dtype)
    u = jax.random.uniform(k, A.data.shape, jnp.float64)

    def f(i, j):
        dj = d[jnp.clip(j, 0, n - 1)]
        diag = jnp.where(i == j, dj, 0.0)
        above = jnp.where(i < j, jnp.floor(u * (dj / 2.0)), 0.0)
        return diag + above

    return IndexDependentFill(A, f)


def KnapsackTypeBasis(n, radius, grid=None, dtype=jnp.float64, key=None):
    """(n+1) x n knapsack-type lattice basis (reference:
    src/matrices/random/lattice/KnapsackTypeBasis.cpp:18-28): identity on
    top of a rounded-uniform row of magnitude <= radius."""
    k = key if key is not None else next_key()
    b = jnp.round(jax.random.uniform(
        k, (n,), jnp.float64, -radius, radius))

    def f(i, j):
        eye = (i == j).astype(jnp.float64)
        bottom = jnp.where(i == n, b[jnp.clip(j, 0, n - 1)], 0.0)
        return eye + bottom

    return _fill(n + 1, n, f, grid, dtype)


# -- remaining deterministic families (completing the SURVEY §2.5 census) ---


def Fiedler(c, grid=None):
    """F_ij = |c_i - c_j| (reference: deterministic/misc/Fiedler.cpp)."""
    c = jnp.asarray(c)
    n = c.shape[0]
    return _fill(n, n, lambda i, j: jnp.abs(c[jnp.clip(i, 0, n - 1)]
                                            - c[jnp.clip(j, 0, n - 1)]),
                 grid, jnp.real(c).dtype)


def Forsythe(n, alpha, lam, grid=None, dtype=jnp.float64):
    """Jordan block J_n(lambda) with alpha placed at (n-1, 0)
    (reference: deterministic/misc/Forsythe.cpp)."""
    return _fill(n, n, lambda i, j: jnp.where(i == j, lam, 0.0)
                 + jnp.where(j == i + 1, 1.0, 0.0)
                 + jnp.where((i == n - 1) & (j == 0), alpha, 0.0),
                 grid, dtype)


def GKS(n, grid=None, dtype=jnp.float64):
    """Golub-Klema-Stewart: diag 1/sqrt(j+1), strict upper -1/sqrt(j+1)
    (reference: deterministic/misc/GKS.cpp)."""
    def f(i, j):
        r = 1.0 / jnp.sqrt((j + 1).astype(dtype))
        return jnp.where(i == j, r, jnp.where(i < j, -r, 0.0))

    return _fill(n, n, f, grid, dtype)


def JordanCholesky(n, grid=None, dtype=jnp.float64):
    """Tridiagonal [2, 5, 2] with A00 = 1, so A = B^H B for the
    unit-upper-bidiagonal B with 2's above the diagonal (reference:
    deterministic/misc/JordanCholesky.cpp)."""
    def f(i, j):
        diag = jnp.where(i == j, jnp.where(i == 0, 1.0, 5.0), 0.0)
        off = jnp.where(jnp.abs(i - j) == 1, 2.0, 0.0)
        return diag + off

    return _fill(n, n, f, grid, dtype)


def Triangle(n, grid=None, dtype=jnp.float64):
    """Banded Toeplitz with symbol z + z^{-2}/4, a classic
    pseudospectra example (reference: deterministic/misc/Triangle.cpp;
    requires n >= 3)."""
    if n < 3:
        raise ValueError("Triangle requires n >= 3 (second-order symbol)")
    return _fill(n, n, lambda i, j: jnp.where(j == i + 1, 1.0, 0.0)
                 + jnp.where(i == j + 2, 0.25, 0.0), grid, dtype)


def TrefethenEmbree(n, grid=None, dtype=jnp.complex128):
    """Banded Toeplitz with symbol 2 z^3 - z^2 + 2i z - 4 z^{-2}
    - 2i z^{-3} (reference: deterministic/misc/TrefethenEmbree.cpp;
    requires n >= 4)."""
    if n < 4:
        raise ValueError("TrefethenEmbree requires n >= 4")

    def f(i, j):
        z = jnp.zeros(i.shape, dtype)
        z = z + jnp.where(j == i + 3, jnp.asarray(2, dtype), 0)
        z = z + jnp.where(j == i + 2, jnp.asarray(-1, dtype), 0)
        z = z + jnp.where(j == i + 1, jnp.asarray(2j, dtype), 0)
        z = z + jnp.where(i == j + 2, jnp.asarray(-4, dtype), 0)
        z = z + jnp.where(i == j + 3, jnp.asarray(-2j, dtype), 0)
        return z

    return _fill(n, n, f, grid, dtype)


def Egorov(phase, n, grid=None, dtype=jnp.complex128):
    """A_ij = exp(i * phase(i, j)) for a batched phase function
    (reference: deterministic/misc/Egorov.cpp)."""
    def f(i, j):
        th = phase(i, j)
        return (jnp.cos(th) + 1j * jnp.sin(th)).astype(dtype)

    return _fill(n, n, f, grid, dtype)


def DynamicRegCounter(n, grid=None, dtype=jnp.float64):
    """2n x 2n block matrix [[JordanCholesky(n), I], [I, -I]] used to
    stress dynamically-regularized solvers (reference:
    deterministic/misc/DynamicRegCounter.cpp)."""
    def f(i, j):
        tl = jnp.where(i == j, jnp.where(i == 0, 1.0, 5.0), 0.0) \
            + jnp.where(jnp.abs(i - j) == 1, 2.0, 0.0)
        tl = jnp.where((i < n) & (j < n), tl, 0.0)
        tr = jnp.where((i < n) & (j == i + n), 1.0, 0.0)
        bl = jnp.where((j < n) & (i == j + n), 1.0, 0.0)
        br = jnp.where((i >= n) & (i == j), -1.0, 0.0)
        return tl + tr + bl + br

    return _fill(2 * n, 2 * n, f, grid, dtype)


def HelmholtzPML(n, omega, num_pml_points=5, sigma=1.5, pml_exp=3.0,
                 grid=None, dtype=jnp.complex128):
    """1-D Helmholtz operator with perfectly-matched-layer boundary
    stretching (reference: deterministic/pde/HelmholtzPML.cpp): complex
    coordinate profile s(x)^-1 = 1 + i (sigma/w) (x/w)^p / k inside the
    PML regions, discretized on n interior points of [0, 1]."""
    omega = jnp.asarray(omega, dtype)
    k = jnp.real(omega) / (2 * math.pi)
    h = 1.0 / (n + 1)
    h2 = h * h
    w = num_pml_points * h

    def profile(x):
        arg = x / w
        return 1.0 + 1j * (sigma / w) * arg ** pml_exp / k

    def s_inv(j):
        jf = j.astype(jnp.float64)
        left = profile((num_pml_points - 1 - jf) * h)
        right = profile((jf - (n - num_pml_points)) * h)
        return jnp.where(j < num_pml_points - 1, left,
                         jnp.where(j > n - num_pml_points, right,
                                   jnp.ones_like(left)))

    def f(i, j):
        sL = s_inv(i - 1)
        sM = s_inv(i)
        sR = s_inv(i + 1)
        termL = (1.0 / sL + 1.0 / sM) / (2 * h2)
        termR = (1.0 / sM + 1.0 / sR) / (2 * h2)
        main = (termL + termR) - omega * omega * sM
        out = jnp.where(i == j, main, jnp.zeros_like(main))
        out = jnp.where((j == i - 1) & (i != 0), -termL, out)
        out = jnp.where((j == i + 1) & (i != n - 1), -termR, out)
        return out.astype(dtype)

    return _fill(n, n, f, grid, dtype)


def UniformHelmholtzGreens(n, lam, grid=None, dtype=jnp.complex128,
                           key=None):
    """Green's-function matrix exp(i gamma)/gamma, gamma = k0 |x_i-x_j|,
    for n points sampled uniformly in the unit ball, k0 = 2 pi / lambda
    (reference: random/misc/UniformHelmholtzGreens.cpp); zero diagonal."""
    k = key if key is not None else next_key()
    k0 = 2 * math.pi / lam
    # rejection-free ball sampling: direction * radius^(1/3)
    kd, kr = jax.random.split(k)
    d = jax.random.normal(kd, (3, n), jnp.float64)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    r = jax.random.uniform(kr, (n,), jnp.float64) ** (1.0 / 3.0)
    X = d * r[None, :]

    def f(i, j):
        xi = X[:, jnp.clip(i, 0, n - 1)]
        xj = X[:, jnp.clip(j, 0, n - 1)]
        gamma = k0 * jnp.sqrt(jnp.sum((xi - xj) ** 2, axis=0))
        safe = jnp.where(gamma == 0, 1.0, gamma)
        val = (jnp.cos(gamma) + 1j * jnp.sin(gamma)) / safe
        return jnp.where(i == j, jnp.zeros_like(val), val).astype(dtype)

    return _fill(n, n, f, grid, dtype)


def EhrenfestStationary(n, grid=None, dtype=jnp.float64):
    """Stationary distribution of the Ehrenfest urn, replicated into
    every row: PInf[i, j] = C(n-1, j) / 2^(n-1)
    (reference: misc/Ehrenfest.cpp:55 EhrenfestStationary)."""
    from jax.scipy.special import gammaln

    j = jnp.arange(n, dtype=jnp.float64)
    logbin = (gammaln(float(n)) - gammaln(j + 1.0)
              - gammaln(float(n) - j))
    row = jnp.exp(logbin - (n - 1) * jnp.log(2.0))
    a = jnp.broadcast_to(row[None, :], (n, n))
    return DistMatrix.from_global(a.astype(dtype), grid=grid)


def EhrenfestDecay(n, grid=None, dtype=jnp.float64):
    """Ehrenfest transition matrix minus its stationary limit
    (reference: misc/Ehrenfest.cpp:101 EhrenfestDecay)."""
    A = Ehrenfest(n, grid, dtype)
    P = EhrenfestStationary(n, grid, dtype)
    return A.with_data(A.data - P.redistribute(*A.dist).data)


def RiffleStationary(n, grid=None, dtype=jnp.float64):
    """Stationary distribution of the riffle shuffle, replicated into
    every row (reference: misc/Riffle.cpp:68 RiffleStationary —
    the Eulerian-number recurrence, quadratic host time as upstream)."""
    sigma = np.zeros(n)
    tmp = np.zeros(n)
    sigma[0] = tmp[0] = 1.0
    for j in range(1, n):
        tmp[0] = sigma[0]
        for k in range(1, j + 1):
            tmp[k] = (k + 1) * sigma[k] + (j - k + 1) * sigma[k - 1]
        sigma[:] = tmp / (j + 1)
    a = np.broadcast_to(sigma[None, :], (n, n))
    return DistMatrix.from_global(jnp.asarray(a, dtype), grid=grid)


def RiffleDecay(n, grid=None, dtype=jnp.float64):
    """Riffle transition matrix minus its stationary limit
    (reference: misc/Riffle.cpp:132 RiffleDecay)."""
    A = Riffle(n, grid, dtype)
    P = RiffleStationary(n, grid, dtype)
    return A.with_data(A.data - P.redistribute(*A.dist).data)


def ImplicitHaar(n, grid=None, dtype=jnp.float64, key=None):
    """Haar-distributed unitary in IMPLICIT (packed Householder) form:
    the QR factorization of a Gaussian matrix (reference:
    random/misc/Haar.cpp ImplicitHaar — returns the packed reflectors
    and taus instead of forming Q)."""
    from ..lapack.qr import QR

    return QR(Gaussian(n, n, grid, dtype, key=key))


def MakeIdentity(A):
    """Overwrite-with-identity (reference: MakeIdentity; functional
    here: returns an identity of A's shape/layout)."""
    return Identity(A.m, A.grid, A.dtype) if A.m == A.n else _fill(
        A.m, A.n, lambda i, j: jnp.where(i == j, 1.0, 0.0), A.grid,
        A.dtype)


def MakeGaussian(A, mean=0.0, stddev=1.0, key=None):
    """Functional MakeGaussian: a Gaussian matrix of A's shape/layout."""
    return Gaussian(A.m, A.n, A.grid, A.dtype, mean, stddev, key=key)


def MakeUniform(A, center=0.0, radius=1.0, key=None):
    """Functional MakeUniform: a Uniform matrix of A's shape/layout."""
    return Uniform(A.m, A.n, A.grid, A.dtype, center, radius, key=key)
