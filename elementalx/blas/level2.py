"""BLAS-like level 2 (reference: src/blas_like/level2/, SURVEY §2.3 —
only Gemv is built by the fork; the rest is source-only spec).

On TPU a matrix-vector product is a thin Gemm; XLA handles the
[MR,*]-style vector redistributions the reference codes by hand
(src/blas_like/level2/Gemv/Normal.hpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, check_same_grid
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    LeftOrRight,
    MC,
    MR,
    NORMAL,
    Orientation,
    TRANSPOSE,
    UPPER,
    UpperOrLower,
)
from .gemm import Gemm
from .level1 import MakeSymmetric
from .trsm import Trsv  # noqa: F401  (level-2 API member, impl in trsm)


def Gemv(orientation: Orientation, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None) -> DistMatrix:
    """y := alpha op(A) x + beta y (reference: Gemv/Normal.hpp,
    Gemv/Transpose.hpp)."""
    return Gemm(orientation, NORMAL, alpha, A, x, beta=beta, C=y)


def Symv(uplo: UpperOrLower, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None, conjugate: bool = False
         ) -> DistMatrix:
    """y := alpha A x + beta y, A symmetric in uplo (reference: Symv.cpp)."""
    Afull = MakeSymmetric(uplo, A.redistribute(MC, MR), conjugate=conjugate)
    return Gemm(NORMAL, NORMAL, alpha, Afull, x, beta=beta, C=y)


def Hemv(uplo: UpperOrLower, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None) -> DistMatrix:
    """Reference: Hemv.cpp."""
    return Symv(uplo, alpha, A, x, beta=beta, y=y, conjugate=True)


def Ger(alpha, x: DistMatrix, y: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x y^H (reference: Ger.cpp)."""
    return Gemm(NORMAL, ADJOINT, alpha, x, y, beta=1.0, C=A)


def Geru(alpha, x: DistMatrix, y: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x y^T (reference: Geru.cpp)."""
    return Gemm(NORMAL, TRANSPOSE, alpha, x, y, beta=1.0, C=A)


def Her(uplo: UpperOrLower, alpha, x: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x x^H on the triangle (reference: Her.cpp)."""
    from .level3 import _merge_triangle

    prod = Gemm(NORMAL, ADJOINT, alpha, x, x, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def Syr(uplo: UpperOrLower, alpha, x: DistMatrix, A: DistMatrix,
        conjugate: bool = False) -> DistMatrix:
    """A += alpha x x^T on the triangle (reference: Syr.cpp)."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    prod = Gemm(NORMAL, orient, alpha, x, x, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def Her2(uplo: UpperOrLower, alpha, x: DistMatrix, y: DistMatrix,
         A: DistMatrix) -> DistMatrix:
    """A += alpha x y^H + conj(alpha) y x^H on the triangle
    (reference: Her2.cpp)."""
    from .level3 import _merge_triangle

    P1 = Gemm(NORMAL, ADJOINT, alpha, x, y, beta=1.0, C=A)
    P2 = Gemm(NORMAL, ADJOINT, jnp.conj(jnp.asarray(alpha)), y, x,
              beta=1.0, C=P1)
    # P2 = A + a x y^H + conj(a) y x^H
    return _merge_triangle(uplo, P2, A.redistribute(MC, MR))


def Syr2(uplo: UpperOrLower, alpha, x: DistMatrix, y: DistMatrix,
         A: DistMatrix, conjugate: bool = False) -> DistMatrix:
    """Reference: Syr2.cpp."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    P1 = Gemm(NORMAL, orient, alpha, x, y, beta=1.0, C=A)
    P2 = Gemm(NORMAL, orient, alpha, y, x, beta=1.0, C=P1)
    return _merge_triangle(uplo, P2, A.redistribute(MC, MR))


def Trmv(uplo: UpperOrLower, orientation: Orientation, diag, A: DistMatrix,
         x: DistMatrix) -> DistMatrix:
    """x := op(T) x for triangular T (reference: Trmv.cpp) — routed
    through Trmm on the column vector (correct TPU altitude)."""
    from .level3 import Trmm

    return Trmm(LEFT, uplo, orientation, diag, 1.0, A, x)


def Trr(uplo: UpperOrLower, alpha, x: DistMatrix, y: DistMatrix,
        A: DistMatrix, conjugate: bool = False) -> DistMatrix:
    """Triangular rank-1 update: the uplo triangle of A += alpha x y'
    (reference: Trr.cpp)."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    prod = Gemm(NORMAL, orient, alpha, x, y, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def Trr2(uplo: UpperOrLower, alpha, X: DistMatrix, Y: DistMatrix,
         A: DistMatrix, conjugate: bool = False) -> DistMatrix:
    """Triangular rank-2 update: the uplo triangle of A += alpha X Y'
    with X, Y of width 2 (reference: Trr2.cpp)."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    prod = Gemm(NORMAL, orient, alpha, X, Y, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def ApplyGivensSequence(side: LeftOrRight, seq_type: str, direction: str,
                        c, s, A: DistMatrix) -> DistMatrix:
    """Apply a sequence of Givens rotations (reference:
    ApplyGivensSequence.cpp, the {s,d,c,z}lasr analogue).

    ``seq_type``: 'variable' (rotation i couples (i, i+1)), 'top'
    (couples (0, i)), 'bottom' (couples (i, last)); ``direction``:
    'forward' | 'backward'. Rotation k maps the pair (p, q) to
    p' = s_k q + c_k p,  q' = c_k q - conj(s_k) p — exactly the
    reference's ApplyVariable/Top/Bottom kernels. The chain is a
    fori_loop over precomputed index tables (sequentially dependent by
    construction; each step is two row/column vector ops)."""
    import numpy as _np

    Am = A.redistribute(MC, MR)
    d = Am.data
    left = side == LEFT
    m = A.m if left else A.n
    nrot = m - 1
    if nrot <= 0:
        return Am
    cs = jnp.asarray(c).reshape(-1)
    sn = jnp.asarray(s).reshape(-1).astype(d.dtype)
    ks = _np.arange(nrot)
    st = seq_type.lower()
    if st.startswith("variable"):
        ps, qs, ci = ks, ks + 1, ks
    elif st.startswith("top"):
        ps, qs, ci = _np.zeros(nrot, int), ks + 1, ks
    elif st.startswith("bottom"):
        ps, qs, ci = ks, _np.full(nrot, m - 1), ks
    else:
        raise ValueError(f"unknown Givens sequence type: {seq_type!r}")
    if direction.lower().startswith("back"):
        ps, qs, ci = ps[::-1], qs[::-1], ci[::-1]
    ps = jnp.asarray(ps.copy(), jnp.int32)
    qs = jnp.asarray(qs.copy(), jnp.int32)
    ci = jnp.asarray(ci.copy(), jnp.int32)
    axis = 0 if left else 1

    def body(k, d):
        p, q, i = ps[k], qs[k], ci[k]
        ck = cs[i].astype(jnp.real(d).dtype)
        sk = sn[i]
        rp = jax.lax.dynamic_index_in_dim(d, p, axis, keepdims=False)
        rq = jax.lax.dynamic_index_in_dim(d, q, axis, keepdims=False)
        gp = sk * rq + ck * rp
        gq = ck * rq - jnp.conj(sk) * rp
        d = jax.lax.dynamic_update_index_in_dim(
            d, gp[None, :] if axis == 0 else gp[:, None], p, axis)
        return jax.lax.dynamic_update_index_in_dim(
            d, gq[None, :] if axis == 0 else gq[:, None], q, axis)

    d = jax.lax.fori_loop(0, nrot, body, d)
    return Am.with_data(Am.mask_padding(d))
