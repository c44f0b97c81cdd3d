"""Singular value decomposition.

Reference: src/lapack_like/spectral/SVD/ (Chan/GolubReinsch via Bidiag +
BidiagSVD with D&C/QR-iteration secular solvers, HermitianSVD, product
variants, TSQR-based TSSVD).

TPU-native design: the default driver is **QDWH-SVD** (polar factor +
Hermitian eigendecomposition — all QR/matmul/MXU work; this is also the
reference's own Polar/QDWH machinery, promoted to the default as the
TPU-optimal algorithm). The Golub-Kahan path (Bidiag + bidiagonal SVD
through the Golub-Kahan tridiagonal embedding, solved by the batched
bisection solver) is provided as the 'gkl' algorithm for parity with the
reference's Chan/GolubReinsch drivers."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import ADJOINT, LOWER, MC, MR, NORMAL, UPPER
from ..blas.gemm import Gemm, local_gemm
from ..blas.level1 import Adjoint
from .hermitian_eig import HermitianEig
from .polar import Polar


def _qdwh_svd_square(A: DistMatrix, nb=None):
    U_p, H = Polar(A, nb=nb)
    w, Q = HermitianEig(LOWER, H, vectors=True)
    # ascending -> descending
    n = A.m
    wdesc = w[::-1]
    Qd = Q.with_data(Q.data[:, jnp.concatenate(
        [jnp.arange(n)[::-1], jnp.arange(n, Q.data.shape[1])])])
    s = jnp.maximum(wdesc, 0.0)
    U = Gemm(NORMAL, NORMAL, 1.0, U_p, Qd)
    return U, s, Qd


def SVD(A: DistMatrix, alg: str = "qdwh", nb=None
        ) -> Tuple[DistMatrix, jax.Array, DistMatrix]:
    """A = U diag(s) V^H, s descending; U is m x min(m,n), V n x min(m,n)
    (reference: SVD.cpp driver; Chan's algorithm QR-reduces tall inputs
    first, as here)."""
    m, n = A.m, A.n
    if m < n:
        V, s, U = SVD(Adjoint(A), alg=alg, nb=nb)
        return U, s, V
    if alg == "gkl":
        return _gkl_svd(A)
    if alg == "dc":
        return _gkl_svd(A, solver="dc")
    if m > n:
        # Chan reduction: A = Q R, then SVD of the square R
        from .qr import ExplicitQR

        Q, R = ExplicitQR(A, blocksize=nb)  # None -> driver default
        Ur, s, V = _qdwh_svd_square(R.redistribute(MC, MR), nb=nb)
        U = Gemm(NORMAL, NORMAL, 1.0, Q, Ur)
        return U, s, V
    return _qdwh_svd_square(A, nb=nb)


def SingularValues(A: DistMatrix, alg: str = "qdwh") -> jax.Array:
    """Singular values only (reference: SVD.cpp values-only paths)."""
    _, s, _ = SVD(A, alg=alg)
    return s


def HermitianSVD(uplo, A: DistMatrix):
    """SVD of a Hermitian matrix via its EVD (reference: HermitianSVD.cpp):
    sigma = |w|, U = Q, V = Q sign(w)."""
    w, Q = HermitianEig(uplo, A, vectors=True)
    s = jnp.abs(w)
    order = jnp.argsort(-s)
    n = A.m
    full = jnp.concatenate([order, jnp.arange(n, Q.data.shape[1])])
    Qs = Q.with_data(Q.data[:, full])
    signs = jnp.where(w[order] < 0, -1.0, 1.0)
    sg = jnp.ones((Q.data.shape[1],), Q.dtype).at[:n].set(
        signs.astype(Q.dtype))
    V = Qs.with_data(Qs.data * sg[None, :])
    return Qs, s[order], V


def _gkl_svd(A: DistMatrix, solver: str = "bisect"):
    """Golub-Kahan path: Bidiag + SVD of the bidiagonal via the
    Golub-Kahan tridiagonal embedding ([0 B; B^H 0] permuted to a
    tridiagonal with zero diagonal), solved by the batched bisection
    tridiagonal eigensolver, or with ``solver='dc'`` by the device-side
    divide-and-conquer with secular merges (reference architecture:
    Bidiag + BidiagSVD, spectral/BidiagSVD.cpp and its DCCtrl path).""" 
    from .condense import Bidiag
    from .reflect import ApplyPackedReflectors
    if solver == "dc":
        from .tridiag_dc_device import tridiag_eig_dc_device as tridiag_eig
    else:
        from .tridiag_eig import tridiag_eig

    m, n = A.m, A.n
    fact = Bidiag(A)
    d = fact.d[:n]
    e = fact.e[: n - 1]
    # Golub-Kahan: T = perm([0 B; B^T 0]) is tridiagonal with offdiag
    # interleaving (d_0, e_0, d_1, e_1, ...); eigenpairs come in +/- sigma
    # pairs with vectors interleaving v and u components.
    offdiag = jnp.zeros((2 * n - 1,), d.dtype)
    offdiag = offdiag.at[0::2].set(d)
    if n > 1:
        offdiag = offdiag.at[1::2].set(e)
    diag = jnp.zeros((2 * n,), d.dtype)
    w, Z = tridiag_eig(diag, offdiag)
    # top n eigenvalues (descending) are the singular values
    s = w[::-1][:n]
    Zs = Z[:, ::-1][:, :n]
    # rows 0,2,4,... are V components; 1,3,5,... are U components
    Vb = Zs[0::2, :] * jnp.sqrt(2.0)
    Ub = Zs[1::2, :] * jnp.sqrt(2.0)
    # backtransform with the bidiag reflectors + phases
    M = fact.packed.data.shape[0]
    N = fact.packed.data.shape[1]
    dt = fact.packed.dtype
    # U = U_house * D_l * Ub
    Ufull = jnp.zeros((M, M), dt)
    pu = jnp.ones((N,), dt).at[: fact.phaseU.shape[0]].set(
        fact.phaseU.astype(dt))
    Ufull = Ufull.at[:n, :n].set((pu[:n, None] * Ub.astype(dt)))
    U = ApplyPackedReflectors(fact.packed.data, fact.tauP, Ufull, 32, n,
                              adjoint=False)
    # V = V_house * D_r * Vb ; right reflectors live in the rows
    pv = jnp.ones((N,), dt).at[: fact.phaseV.shape[0]].set(
        fact.phaseV.astype(dt))
    Vfull = jnp.zeros((N, N), dt)
    Vfull = Vfull.at[:n, :n].set(pv[:n, None] * Vb.astype(dt))
    # apply right reflectors: they are stored in rows j, cols j+2.. with
    # unit at j+1 (see condense.Bidiag); build the packed-column form
    rowdata = fact.packed.data[:N, :N]
    packedV = jnp.conj(rowdata.T)  # column j now holds conj of row j
    # shift: reflector j has unit at position j+1 => offset=1 packing
    tauQ = fact.tauQ
    V = ApplyPackedReflectors(packedV, tauQ, Vfull, 32, max(n - 1, 0),
                              adjoint=False, offset=1)
    from ..core.dmatrix import pad_array

    Udm = DistMatrix.from_padded(U[:, :M], m, n, MC, MR, A.grid, A.wrap)
    Udm = Udm.with_data(Udm.mask_padding(Udm.data))
    Vdm = DistMatrix.from_padded(V, n, n, MC, MR, A.grid, A.wrap)
    Vdm = Vdm.with_data(Vdm.mask_padding(Vdm.data))
    return Udm, s, Vdm


def BidiagSVD(uplo, d: jax.Array, e: jax.Array, vectors: bool = False,
              solver: str = "bisect"):
    """SVD of a bidiagonal matrix given its main and off diagonal
    (reference: spectral.hpp:1151 BidiagSVD, spectral/BidiagSVD.cpp).
    ``uplo`` selects upper or lower bidiagonal; returns ``s``
    (descending) or ``(U, s, V)`` with B = U diag(s) V^H. Solved by the
    Golub-Kahan tridiagonal embedding ([0 B; B^H 0] permuted to a
    zero-diagonal tridiagonal whose eigenpairs are the +/-sigma pairs),
    through the batched bisection eigensolver or, with ``solver='dc'``,
    the device divide-and-conquer."""
    from ..core.types import UPPER as _UP

    if solver == "dc":
        from .tridiag_dc_device import tridiag_eig_dc_device as _teig
    else:
        from .tridiag_eig import tridiag_eig as _teig

    d = jnp.asarray(d)
    e = jnp.asarray(e)
    if jnp.iscomplexobj(d) or jnp.iscomplexobj(e):
        # the reference phase-rotates a complex bidiagonal to real form
        # first (as our Bidiag does); the GK embedding assumes real d, e
        raise ValueError("BidiagSVD expects the real bidiagonal form "
                         "(rotate phases out first, as Bidiag does)")
    n = d.shape[0]
    if n == 0:
        z = jnp.zeros((0,), d.dtype)
        return z if not vectors else (jnp.zeros((0, 0), d.dtype), z,
                                      jnp.zeros((0, 0), d.dtype))
    offdiag = jnp.zeros((2 * n - 1,), d.dtype)
    offdiag = offdiag.at[0::2].set(d)
    if n > 1:
        offdiag = offdiag.at[1::2].set(e[: n - 1])
    w, Z = _teig(jnp.zeros((2 * n,), d.dtype), offdiag)
    s = w[::-1][:n]
    if not vectors:
        return s
    Zs = Z[:, ::-1][:, :n]
    V = Zs[0::2, :] * jnp.sqrt(2.0)
    U = Zs[1::2, :] * jnp.sqrt(2.0)
    if uplo == _UP:
        return U, s, V
    # lower bidiagonal B = (upper bidiagonal of B^H)^H: swap U and V
    return V, s, U
