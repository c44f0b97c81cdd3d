"""Polar decomposition via QDWH.

Reference: src/lapack_like/spectral/Polar.cpp (+ Polar/QDWH.hpp): QDWH
(QR-based dynamically weighted Halley) — the reference's own choice and
*the* TPU-native spectral primitive: every iteration is one tall QR +
matmuls, all MXU work, backward stable, <= 6-8 iterations to machine
precision. Also the engine for the SDC eigensolver/SVD paths.

TPU refinement: once the Halley weight c drops to <= 100 the iteration
switches to the Cholesky form (Z = I + c X^H X; X' = (b/c) X +
(a - b/c) X Z^{-1}) — the Nakatsukasa-Higham variant that replaces the
stacked (2M, M) QR + reflector apply with a Gram + Cholesky + two
matmuls; cond(Z) <= 1 + c keeps it backward stable. In practice only
the first 1-2 iterations (wild c from the sigma_min lower bound) take
the QR path."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import ADJOINT, LOWER, MC, MR, NORMAL
from ..blas.gemm import Gemm, local_gemm
from .qr import _qr_packed
from .reflect import ApplyPackedReflectors


def _qdwh_params(l: jax.Array):
    """Dynamically-weighted Halley coefficients (Nakatsukasa-Bai-Gygi)."""
    l2 = l * l
    dd = jnp.cbrt(4.0 * (1.0 - l2) / (l2 * l2))
    sqd = jnp.sqrt(1.0 + dd)
    inner = 8.0 - 4.0 * dd + 8.0 * (2.0 - l2) / (l2 * sqd)
    a = sqd + 0.5 * jnp.sqrt(jnp.maximum(inner, 0.0))
    b = (a - 1.0) ** 2 / 4.0
    c = a + b - 1.0
    return a, b, c


import functools


@functools.partial(jax.jit, static_argnames=("m", "nb", "max_its"))
def qdwh(a: jax.Array, m: int, nb: Optional[int] = None, max_its: int = 10,
         l0: Optional[jax.Array] = None) -> jax.Array:
    """Unitary polar factor of the (padded, square with identity padding
    handled by caller) array ``a`` whose logical size is m.

    QR-based iteration:
      [Q1; Q2] = qr([sqrt(c) X; I]),
      X <- (b/c) X + (1/sqrt(c)) (a - b/c) Q1 Q2^H
    jitted as one while_loop with the convergence test (lower bound l
    reaching 1) in-graph."""
    M = a.shape[0]
    if nb is None:
        from .qr import _use_cholqr_panels

        # measured (v5e, Polar 4096 f32): nb=256 94.5 ms vs nb=128
        # 116.6 — the cholqr panels make wider QR-iteration blocks win
        nb = 256 if _use_cholqr_panels(a.dtype, 256) else 128
    rdt = jnp.real(a).dtype
    eps = jnp.finfo(rdt).eps
    # scale so ||X||_2 <= 1 (Frobenius bound)
    alpha = jnp.sqrt(jnp.sum(jnp.abs(a) ** 2)) + eps
    X = a / alpha.astype(a.dtype)
    # lower bound on sigma_min(X); a loose bound only costs iterations
    l = jnp.asarray(eps if l0 is None else l0, rdt)

    eyeM = jnp.eye(M, dtype=a.dtype)

    def cond(carry):
        X, l, k = carry
        return (k < max_its) & (l < 1.0 - 10 * eps)

    def body(carry):
        X, l, k = carry
        aa, bb, cc = _qdwh_params(jnp.maximum(l, eps))

        def qr_it(X):
            sc = jnp.sqrt(cc).astype(a.dtype)
            # QR of the stacked [sqrt(c) X; I]; the zero padding of X
            # makes the corresponding Q1 rows/cols zero, so padding
            # stays zero.
            stacked = jnp.concatenate([sc * X, eyeM], axis=0)
            packed, tau = _qr_packed(stacked, 2 * M, M, nb)
            Q = ApplyPackedReflectors(packed, tau,
                                      jnp.eye(2 * M, M, dtype=a.dtype),
                                      nb, M, adjoint=False)
            Q1, Q2 = Q[:M], Q[M:]
            coef = ((aa - bb / cc) / jnp.sqrt(cc)).astype(a.dtype)
            return (bb / cc).astype(a.dtype) * X + coef * local_gemm(
                Q1, jnp.conj(Q2.T))

        def chol_it(X):
            # Cholesky-based iteration (Nakatsukasa-Higham: valid and
            # backward stable once c is modest, cond(Z) <= 1 + c):
            #   Z = I + c X^H X = L L^H,
            #   X Z^{-1} = (X L^{-H}) L^{-1},
            #   X' = (b/c) X + (a - b/c) X Z^{-1}.
            # Pure MXU work (Gram + chol + batched log-depth trinv +
            # two matmuls) — ~3x fewer flops than the stacked-QR
            # iteration and no tall reflector apply. The padding rows
            # of X are zero, so Z has an exact identity padding block
            # and the trinv/padding invariants hold.
            from ..blas.trinv import tri_inv_lower

            low = a.dtype in (jnp.bfloat16, jnp.float16)
            zdt = jnp.float32 if low else a.dtype
            Xz = X.astype(zdt)
            Z = jnp.eye(M, dtype=zdt) + cc.astype(zdt) * local_gemm(
                jnp.conj(Xz.T), Xz)
            L = jax.lax.linalg.cholesky(Z, symmetrize_input=False)
            Linv = tri_inv_lower(L)
            XZi = local_gemm(local_gemm(Xz, jnp.conj(Linv.T)), Linv)
            out = (bb / cc).astype(zdt) * Xz \
                + (aa - bb / cc).astype(zdt) * XZi
            return out.astype(a.dtype)

        X = jax.lax.cond(cc <= 100.0, chol_it, qr_it, X)
        l = l * (aa + bb * l * l) / (1.0 + cc * l * l)
        return X, jnp.minimum(l, 1.0), k + 1

    X, l, _ = jax.lax.while_loop(cond, body,
                                 (X, l, jnp.zeros((), jnp.int32)))
    return X


def Polar(A: DistMatrix, nb: Optional[int] = None
          ) -> Tuple[DistMatrix, DistMatrix]:
    """A = U P with U unitary (logical block) and P Hermitian PSD
    (reference: Polar.cpp). Square A."""
    if A.m != A.n:
        raise ValueError("Polar here requires square A (QR-reduce first)")
    Am = A.redistribute(MC, MR)
    U = qdwh(Am.data, A.m, nb)
    Udm = Am.with_data(U)
    # P = U^H A, Hermitian-symmetrised
    P = Gemm(ADJOINT, NORMAL, 1.0, Udm, Am)
    Pd = 0.5 * (P.data + jnp.conj(P.data.T))
    return Udm, P.with_data(Pd)


def HermitianPolar(uplo, A: DistMatrix, nb: Optional[int] = None
                   ) -> Tuple[DistMatrix, DistMatrix]:
    """Polar of a Hermitian matrix = matrix sign pairing
    (reference: Polar.cpp hermitian path)."""
    from ..blas.level1 import MakeHermitian

    return Polar(MakeHermitian(uplo, A.redistribute(MC, MR)), nb)
