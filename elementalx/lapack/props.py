"""Matrix properties: norms, condition numbers, determinants.

Reference: src/lapack_like/props/ — Norm family (Frobenius via scaled
squares + two-stage AllReduce, props/Norm/Frobenius.cpp:98-112; One/
Infinity/Max/Entrywise/Zero; Two via SVD; TwoEstimate via power
iteration; KyFan/Schatten/Nuclear), Condition, Determinant (SafeProduct
off LU), Trace, Inertia.

On TPU every norm is one masked reduction XLA turns into on-chip
tree-reduce + psum."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import MC, MR, NORMAL, UpperOrLower
from ..blas.level1 import (
    ColumnNorms,
    MakeSymmetric,
    MaxAbs,
    Nrm2,
    Trace,  # noqa: F401  (re-export; reference keeps Trace in props)
)


def FrobeniusNorm(A: DistMatrix) -> jax.Array:
    """Reference: props/Norm/Frobenius.cpp (scaled-squares)."""
    return Nrm2(A)


def MaxNorm(A: DistMatrix) -> jax.Array:
    return MaxAbs(A)


def OneNorm(A: DistMatrix) -> jax.Array:
    """max column absolute sum (reference: props/Norm/One.hpp)."""
    return jnp.max(jnp.sum(jnp.abs(A.data), axis=0))


def InfinityNorm(A: DistMatrix) -> jax.Array:
    """max row absolute sum (reference: props/Norm/Infinity.hpp)."""
    return jnp.max(jnp.sum(jnp.abs(A.data), axis=1))


def EntrywiseNorm(A: DistMatrix, p: float = 1.0) -> jax.Array:
    from ..blas.level1 import EntrywiseNorm as _e

    return _e(A, p)


def ZeroNorm(A: DistMatrix, tol: float = 0.0) -> jax.Array:
    """number of nonzeros (reference: props/Norm/Zero.hpp)."""
    return jnp.sum((jnp.abs(A.data) > tol).astype(jnp.int32))


def TwoNormEstimate(A: DistMatrix, tol: float = 1e-6, max_its: int = 100
                    ) -> jax.Array:
    """Power iteration on A^H A (reference: props/Norm/TwoEstimate.hpp)."""
    d = A.data
    rdt = jnp.real(d).dtype
    key = jax.random.key(17)
    x = jax.random.normal(key, (d.shape[1],), rdt).astype(d.dtype)

    def body(_, x):
        y = d @ x
        z = jnp.conj(d.T) @ y
        nz = jnp.sqrt(jnp.sum(jnp.abs(z) ** 2))
        return z / jnp.where(nz == 0, 1, nz)

    x = jax.lax.fori_loop(0, max_its, body, x)
    y = d @ x
    return jnp.sqrt(jnp.sum(jnp.abs(y) ** 2)).astype(rdt)


def TwoNorm(A: DistMatrix) -> jax.Array:
    """Largest singular value (reference: props/Norm/Two.hpp, via SVD)."""
    from .svd import SingularValues

    s = SingularValues(A)
    return s[0]


def SchattenNorm(A: DistMatrix, p: float) -> jax.Array:
    """(sum sigma_i^p)^(1/p) (reference: props/Norm/Schatten.hpp)."""
    from .svd import SingularValues

    s = SingularValues(A)
    return jnp.sum(s ** p) ** (1.0 / p)


def NuclearNorm(A: DistMatrix) -> jax.Array:
    return SchattenNorm(A, 1.0)


def KyFanNorm(A: DistMatrix, k: int) -> jax.Array:
    from .svd import SingularValues

    s = SingularValues(A)
    return jnp.sum(s[:k])


def SymmetricMaxNorm(uplo: UpperOrLower, A: DistMatrix) -> jax.Array:
    return MaxAbs(MakeSymmetric(uplo, A.redistribute(MC, MR)))


_NORMS = {
    "one": lambda A: OneNorm(A),
    "infinity": lambda A: InfinityNorm(A),
    "entrywise_one": lambda A: EntrywiseNorm(A, 1.0),
    "max": lambda A: MaxNorm(A),
    "nuclear": lambda A: NuclearNorm(A),
    "frobenius": lambda A: FrobeniusNorm(A),
    "two": lambda A: TwoNorm(A),
}


def Norm(A: DistMatrix, norm_type: str = "frobenius") -> jax.Array:
    """NormType dispatcher (reference: props.hpp:128 `Norm(A, type)`,
    FROBENIUS_NORM default). Accepts 'one' | 'infinity' | 'entrywise_one'
    | 'max' | 'nuclear' | 'frobenius' | 'two' (the reference's enum,
    lower-cased sans _NORM)."""
    try:
        return _NORMS[norm_type.lower()](A)
    except KeyError:
        raise ValueError(f"unknown norm type: {norm_type!r} "
                         f"(expected one of {sorted(_NORMS)})")


def SymmetricNorm(uplo: UpperOrLower, A: DistMatrix,
                  norm_type: str = "frobenius") -> jax.Array:
    """Norm of a symmetric matrix stored in one triangle
    (reference: props.hpp:134 SymmetricNorm)."""
    return Norm(MakeSymmetric(uplo, A.redistribute(MC, MR)), norm_type)


def HermitianNorm(uplo: UpperOrLower, A: DistMatrix,
                  norm_type: str = "frobenius") -> jax.Array:
    """Hermitian-stored norm (reference: props.hpp:142 HermitianNorm)."""
    from ..blas.level1 import MakeHermitian

    return Norm(MakeHermitian(uplo, A.redistribute(MC, MR)), norm_type)


# ---------------------------------------------------------------------------
# determinant (reference: props/Determinant.cpp — SafeProduct off LU)
# ---------------------------------------------------------------------------


class SafeProduct(NamedTuple):
    """rho * exp(kappa * n) representation (reference:
    include/El/lapack_like/props.hpp SafeProduct)."""

    rho: jax.Array    # sign / phase
    kappa: jax.Array  # (1/n) sum log |d_i|
    n: int


def _perm_parity(perm: jax.Array, m: int) -> jax.Array:
    """(-1)^inversions of the image vector, counted with one masked outer
    comparison (O(n^2) on the VPU — trivial next to the LU itself)."""
    p = perm[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], p.shape[0]), 0)
    jdx = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], p.shape[0]), 1)
    live = (idx < m) & (jdx < m)
    inv = jnp.sum(jnp.where(live & (idx < jdx) & (p[:, None] > p[None, :]),
                            1, 0))
    return 1 - 2 * (inv % 2)


def SafeDeterminant(A: DistMatrix) -> SafeProduct:
    from .lu import LU

    F, P = LU(A)
    d = jnp.diagonal(F.data)
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    live = idx < A.m
    mag = jnp.where(live, jnp.abs(d), jnp.ones_like(jnp.abs(d)))
    kappa = jnp.sum(jnp.log(mag)) / A.m
    phase = jnp.where(live, d / jnp.where(mag == 0, 1, mag).astype(d.dtype),
                      jnp.ones_like(d))
    rho = jnp.prod(phase) * _perm_parity(P.perm, A.m).astype(d.dtype)
    return SafeProduct(rho, kappa, A.m)


def Determinant(A: DistMatrix) -> jax.Array:
    sp = SafeDeterminant(A)
    return sp.rho * jnp.exp(sp.kappa * sp.n)


def SafeHPDDeterminant(uplo: UpperOrLower, A: DistMatrix) -> SafeProduct:
    """Reference: props/Determinant.cpp HPD path via Cholesky."""
    from .cholesky import Cholesky

    L = Cholesky(uplo, A)
    d = jnp.real(jnp.diagonal(L.data))
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    live = idx < A.m
    mag = jnp.where(live, jnp.abs(d), jnp.ones_like(d))
    kappa = 2.0 * jnp.sum(jnp.log(mag)) / A.m
    return SafeProduct(jnp.ones((), d.dtype), kappa, A.m)


def HPDDeterminant(uplo: UpperOrLower, A: DistMatrix) -> jax.Array:
    sp = SafeHPDDeterminant(uplo, A)
    return jnp.exp(sp.kappa * sp.n)


# ---------------------------------------------------------------------------
# condition numbers (reference: props/Condition.cpp)
# ---------------------------------------------------------------------------


def Condition(A: DistMatrix, norm: str = "two") -> jax.Array:
    if norm == "two":
        return TwoCondition(A)
    if norm == "one":
        return OneCondition(A)
    if norm == "infinity":
        return InfinityCondition(A)
    if norm == "frobenius":
        return FrobeniusCondition(A)
    raise ValueError(norm)


def _with_inverse(A: DistMatrix, normfn) -> jax.Array:
    from .funcs import Inverse

    Ainv = Inverse(A)
    return normfn(A) * normfn(Ainv)


def OneCondition(A: DistMatrix) -> jax.Array:
    return _with_inverse(A, OneNorm)


def InfinityCondition(A: DistMatrix) -> jax.Array:
    return _with_inverse(A, InfinityNorm)


def FrobeniusCondition(A: DistMatrix) -> jax.Array:
    return _with_inverse(A, FrobeniusNorm)


def TwoCondition(A: DistMatrix) -> jax.Array:
    from .svd import SingularValues

    s = SingularValues(A)
    k = min(A.m, A.n)
    return s[0] / s[k - 1]


def OneConditionEstimate(A: DistMatrix, solve=None, its: int = 5):
    """Hager-Higham 1-norm condition ESTIMATE without forming the inverse
    (the lapack xGECON role; reference keeps HagerHigham machinery in
    Pseudospectra/HagerHigham.hpp). Uses a handful of LU solves."""
    import numpy as np

    from ..core.types import NORMAL, TRANSPOSE
    from .lu import LU, SolveAfter

    n = A.m
    F, P = LU(A)

    def sv(r, trans):
        R = DistMatrix.from_global(r.reshape(n, 1), MC, MR, A.grid)
        out = SolveAfter(TRANSPOSE if trans else NORMAL, F, P, R)
        return np.asarray(out.global_array())[:, 0]

    x = np.full(n, 1.0 / n)
    est = 0.0
    for _ in range(its):
        y = sv(x, False)
        est_new = np.abs(y).sum()
        xi = np.sign(y)
        xi[xi == 0] = 1.0
        z = sv(xi, True)
        j = int(np.argmax(np.abs(z)))
        if np.abs(z).max() <= z @ x or est_new <= est:
            est = max(est, est_new)
            break
        est = est_new
        x = np.zeros(n)
        x[j] = 1.0
    return float(OneNorm(A)) * est


def _herm_full(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    from ..blas.level1 import MakeHermitian

    return MakeHermitian(uplo, A.redistribute(MC, MR))


def _symm_full(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    return MakeSymmetric(uplo, A.redistribute(MC, MR))


# named Hermitian/Symmetric norm variants (reference: props.hpp declares
# one per norm; here each is the dispatcher over the symmetrized matrix)

def HermitianFrobeniusNorm(uplo, A):
    return FrobeniusNorm(_herm_full(uplo, A))


def HermitianMaxNorm(uplo, A):
    return MaxAbs(_herm_full(uplo, A))


def HermitianEntrywiseNorm(uplo, A, p: float = 1.0):
    return EntrywiseNorm(_herm_full(uplo, A), p)


def HermitianNuclearNorm(uplo, A):
    return NuclearNorm(_herm_full(uplo, A))


def HermitianSchattenNorm(uplo, A, p: float):
    return SchattenNorm(_herm_full(uplo, A), p)


def HermitianKyFanNorm(uplo, A, k: int):
    return KyFanNorm(_herm_full(uplo, A), k)


def HermitianTwoNorm(uplo, A):
    return TwoNorm(_herm_full(uplo, A))


def HermitianTwoNormEstimate(uplo, A, **kw):
    return TwoNormEstimate(_herm_full(uplo, A), **kw)


def SymmetricFrobeniusNorm(uplo, A):
    return FrobeniusNorm(_symm_full(uplo, A))


def SymmetricEntrywiseNorm(uplo, A, p: float = 1.0):
    return EntrywiseNorm(_symm_full(uplo, A), p)


def SymmetricNuclearNorm(uplo, A):
    return NuclearNorm(_symm_full(uplo, A))


def SymmetricSchattenNorm(uplo, A, p: float):
    return SchattenNorm(_symm_full(uplo, A), p)


def SymmetricKyFanNorm(uplo, A, k: int):
    return KyFanNorm(_symm_full(uplo, A), k)


def SymmetricTwoNorm(uplo, A):
    return TwoNorm(_symm_full(uplo, A))


def SymmetricTwoNormEstimate(uplo, A, **kw):
    return TwoNormEstimate(_symm_full(uplo, A), **kw)


def KyFanSchattenNorm(A: DistMatrix, k: int, p: float) -> jax.Array:
    """(sum of the k largest singular values^p)^(1/p) (reference:
    props.hpp KyFanSchattenNorm — the Ky-Fan/Schatten hybrid)."""
    from .svd import SingularValues

    s = SingularValues(A)
    return jnp.sum(s[:k] ** p) ** (1.0 / p)


def HermitianKyFanSchattenNorm(uplo, A, k: int, p: float):
    return KyFanSchattenNorm(_herm_full(uplo, A), k, p)


def SymmetricKyFanSchattenNorm(uplo, A, k: int, p: float):
    return KyFanSchattenNorm(_symm_full(uplo, A), k, p)
