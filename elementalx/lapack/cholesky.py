"""Distributed Cholesky factorization.

Reference: src/lapack_like/factor/Cholesky.cpp:96-145 (driver),
factor/Cholesky/UpperVariant3.hpp:76-124 / LowerVariant3.hpp (blocked
right-looking variant-3), PivotedLowerVariant3.hpp (full pivoting),
SolveAfter.hpp, ReverseLowerVariant3.hpp, CholeskyMod.hpp.

TPU-native design: recursive right-looking splitting (static shapes, a
log-depth chain of full-size MXU matmuls) instead of the reference's
panel loop. Each level:

    A = [[A11, .  ],      L11 = chol(A11)
         [A21, A22]]      L21 = A21 inv(L11)^H          (Trsm, MXU)
                          A22' = A22 - L21 L21^H        (Syrk, MXU)

which is exactly Variant-3 semantics (UpperVariant3.hpp:76-124) with the
panel broadcast/allgather plans replaced by XLA's sharding propagation.
The base-case block factorization is XLA's on-device Cholesky.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.environment import Blocksize, NonHPDMatrixException
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    UPPER,
    UpperOrLower,
)
from ..blas.gemm import local_gemm
from ..blas.level1 import MakeHermitian, MakeTrapezoidal
from ..blas.trsm import Trsm


def _chol_lower_rec(a: jax.Array, nb: int, precision=None,
                    store=None) -> jax.Array:
    """Recursive lower Cholesky of a padded Hermitian array whose padding
    diagonal is 1. Static shapes throughout; only the lower triangle of
    `a` is read (trailing updates keep garbage above the diagonal).
    `precision` governs the MXU matmuls of the trsm panels and trailing
    updates (DEFAULT = single-pass bf16 with f32 accumulation for
    bf16-storage inputs; None = library default, full f32).

    ``store`` (e.g. bfloat16): the factor blocks are RETURNED in the
    storage dtype and every panel/update matmul runs with store-dtype
    operands + carrier-dtype (f32) accumulation. Numerically this equals
    the DEFAULT-precision f32-carrier path (the MXU truncates operands
    to bf16 either way), but the L blocks move through the concatenate
    tree and the gemm operand reads at half the HBM bytes — these
    bandwidth terms, not FLOPs, dominate the bf16 factorization."""
    n = a.shape[0]
    if n <= nb:
        # symmetrize_input=False: the upper triangle holds garbage from
        # the lower-only trailing updates and must not be averaged in
        l = jax.lax.linalg.cholesky(a, symmetrize_input=False)
        return l.astype(store) if store is not None else l
    h = n // 2
    # keep splits grid-aligned when possible (n is a multiple of the grid
    # quantum by construction; h inherits half of it)
    a11 = a[:h, :h]
    a21 = a[h:, :h]
    a22 = a[h:, h:]
    l11 = _chol_lower_rec(a11, nb, precision, store)
    # L21 = A21 inv(L11)^H — partitioned-inverse blocked substitution
    # (pure MXU matmuls; XLA's TriangularSolve lowers to a slow
    # scalar-ish substitution on TPU)
    from ..blas.trsm import _right_solve_adjoint_lower

    if store is not None:
        # bf16 storage: the trsm reads its triangular operand STRAIGHT
        # from the storage-dtype l11 (mixed-mode solve, half the HBM
        # bytes; measured 2 ms at N=16384 over casting l11 up) and the
        # rank-k runs single-pass full-square — a lower-triangle-only
        # 2x2 split was measured SLOWER here (40.5 vs 31.1 ms at 16384:
        # splitting the 190 TF/s MXU matmul costs more than the saved
        # flops)
        l21 = _right_solve_adjoint_lower(l11, a21, nb,
                                         precision=precision).astype(store)
        upd = jnp.matmul(l21, jnp.conj(l21.T),
                         precision=jax.lax.Precision.DEFAULT,
                         preferred_element_type=a.dtype)
        a22u = a22 - upd
    else:
        l21 = _right_solve_adjoint_lower(l11, a21, nb,
                                         precision=precision)
        # f32/f64: matmuls run multi-pass (HIGH: bf16x3), so the 2x2
        # block-triangular trailing update's 3/4-FLOPs beats the single
        # full-square matmul once the blocks are MXU-sized
        if n >= _TRI_UPDATE_MIN:
            q = h // 2
            p1, p2 = l21[:q], l21[q:]
            b11 = a22[:q, :q] - local_gemm(p1, jnp.conj(p1.T),
                                           precision=precision)
            b21 = a22[q:, :q] - local_gemm(p2, jnp.conj(p1.T),
                                           precision=precision)
            b22 = a22[q:, q:] - local_gemm(p2, jnp.conj(p2.T),
                                           precision=precision)
            a22u = jnp.concatenate(
                [jnp.concatenate([b11, a22[:q, q:]], axis=1),
                 jnp.concatenate([b21, b22], axis=1)], axis=0)
        else:
            a22u = a22 - local_gemm(l21, jnp.conj(l21.T),
                                    precision=precision)
    l22 = _chol_lower_rec(a22u, nb, precision, store)
    dt = l11.dtype
    top = jnp.concatenate([l11, jnp.zeros((h, n - h), dt)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


_TRI_UPDATE_MIN = 8192


def _chol_lower_left(a: jax.Array, nb: int, precision=None,
                     store=None) -> jax.Array:
    """LEFT-looking blocked lower Cholesky of a padded array whose pad
    diagonal is 1 (lower triangle valid, upper ignored). Single-chip
    fast path: the right-looking recursion pays a log-depth concatenate
    tree plus FULL-SQUARE trailing syrk flops (n^3/2 MXU work), while
    left-looking applies the history product to the CURRENT PANEL only —
    exactly n^3/3 flops, no trailing-matrix writes, factor accumulated
    in one preallocated buffer via dynamic-update-slice (measured
    16384: bf16 27.4 -> 20.8 ms, f32 48.3 -> 40.1 ms; scratch/ab_chol2).
    Matches factor/Cholesky/LowerVariant2.hpp semantics (the reference's
    left-looking variant) on MXU-sized panels."""
    M = a.shape[0]
    sdt = store or a.dtype
    # ``a`` may arrive in the low-precision STORAGE dtype: panels are
    # upcast to the f32 carrier slice-by-slice (the old whole-matrix
    # astype cost ~2 ms of HBM at N=16384 bf16 and doubled every panel
    # read; the MXU truncates DEFAULT-precision operands to bf16 either
    # way, so accumulating pan - hist@row^H in f32 per slice is
    # numerically identical to the f32-carrier whole-matrix scheme).
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    cdt = jnp.float32 if low else a.dtype
    # opt-in fused Pallas panel tail (kernels/potrf.py). MEASURED NULL
    # on-chip (scratch/ab_chol7.py, same session): bf16 16384 Pallas
    # 21.73 vs XLA 21.11 ms — the XLA chol+trinv+matmul tail is already
    # ~0.1 ms/panel (prof_chol7.py), so there was nothing to fuse away.
    # Kept behind ELX_PALLAS_POTRF=1 for rechecks on other chips.
    import os

    from ..kernels.common import on_tpu

    fuse_tail = (on_tpu() and cdt == jnp.float32 and M % nb == 0
                 and nb % 128 == 0
                 and os.environ.get("ELX_PALLAS_POTRF") == "1")
    if fuse_tail:
        from ..kernels.potrf import potrf_panel_tail
    # diagonal-only fused tail (potrf_block_inv): ONE kernel launch for
    # chol(A11) + inv(L11)^H per panel in place of ~15 small XLA
    # dispatches; the L21 matmul stays on XLA's MXU. MEASURED NULL
    # (scratch/ab_chol11.py, same session): bf16 16384 20.48 vs 15.77,
    # f32 41.07 vs ~35 — the kernel's sequential per-column (8, w)
    # elimination costs ~+0.15 ms/panel over XLA's chol+trinv on this
    # stack. Kept opt-in for rechecks on other chips/toolchains.
    diag_tail = (on_tpu() and cdt == jnp.float32 and nb % 128 == 0
                 and not fuse_tail
                 and os.environ.get("ELX_POTRF_DIAG") == "1")
    if diag_tail:
        from ..kernels.potrf import potrf_block_inv
    from ..blas.trinv import tri_inv_lower

    # LOOKAHEAD (measured, scratch/prof_chol8.py): the skeleton of
    # history gemms + block stores costs only ~8 ms of the ~21 ms
    # driver at bf16 16384 — the rest is the SERIAL chain panel tail ->
    # next history gemm (the gemm read of Lbuf[:, :k0] includes the
    # freshly stored block, so nothing overlaps). Splitting the history
    # product into "old" columns (available two panels back) and the
    # previous block's rank-w contribution lets XLA overlap each big
    # old-history gemm with the previous panel's small serial tail.
    # TWO-PANEL-DEEP lookahead (ELX_CHOL_LA2=1, A/B only): the big
    # history gemm of panel k reads only columns [0, k0-2nb) — blocks
    # k-2 and k-1 enter as separate rank-nb terms — so it depends on
    # nothing later than tail k-3 and XLA may schedule it before BOTH
    # preceding serial tails. One extra rank-nb gemm per panel.
    la2 = os.environ.get("ELX_CHOL_LA2") == "1"
    Lbuf = jnp.zeros((M, M), sdt)
    blk_prev = None
    blk_prev2 = None
    for k0 in range(0, M, nb):
        w = min(nb, M - k0)
        pan = a[k0:, k0:k0 + w].astype(cdt)
        depth = 2 * nb if la2 else nb
        j0 = k0 - depth       # column start of the near-history blocks
        if k0 > 0:
            if j0 > 0:
                hist = Lbuf[k0:, :j0]
                row = Lbuf[k0:k0 + w, :j0]
                pan = pan - jnp.matmul(hist, jnp.conj(row.T),
                                       precision=precision,
                                       preferred_element_type=cdt)
            if la2 and k0 >= 2 * nb:
                b2 = blk_prev2   # (M - (k0-2nb), nb)
                pan = pan - jnp.matmul(
                    b2[2 * nb:], jnp.conj(b2[2 * nb:2 * nb + w].T),
                    precision=precision, preferred_element_type=cdt)
            bl = blk_prev     # (M - (k0-nb), nb): previous factor column
            pan = pan - jnp.matmul(bl[nb:], jnp.conj(bl[nb:nb + w].T),
                                   precision=precision,
                                   preferred_element_type=cdt)
        if fuse_tail:
            a11 = pan[:w]
            sym = jnp.tril(a11) + jnp.tril(a11, -1).T
            blk = potrf_panel_tail(sym, pan,
                                   low_apply=low).astype(sdt)
        elif diag_tail and w == nb:
            a11 = pan[:w]
            sym = jnp.tril(a11) + jnp.tril(a11, -1).T
            l11, invLH = potrf_block_inv(sym)
            blk = l11.astype(sdt)
            if k0 + w < M:
                l21 = jnp.matmul(pan[w:], invLH.astype(pan.dtype),
                                 precision=precision,
                                 preferred_element_type=cdt)
                blk = jnp.concatenate([blk, l21.astype(sdt)], axis=0)
        else:
            a11 = pan[:w]
            l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
            blk = l11.astype(sdt)
            if k0 + w < M:
                # HIGH (3-pass) inversion on the f32 carrier — the
                # 6-pass library default doubles this serial-tail op
                # for no accuracy the DEFAULT/HIGH l21 matmul can see
                inv11 = tri_inv_lower(l11, precision=jax.lax.Precision.HIGH
                                      if cdt == jnp.float32 else None)
                l21 = jnp.matmul(pan[w:],
                                 jnp.conj(inv11.T).astype(pan.dtype),
                                 precision=precision,
                                 preferred_element_type=cdt)
                blk = jnp.concatenate([blk, l21.astype(sdt)], axis=0)
        Lbuf = jax.lax.dynamic_update_slice(Lbuf, blk, (k0, k0))
        blk_prev2 = blk_prev
        blk_prev = blk
    return Lbuf


def _chol_lower_left2(a: jax.Array, outer: int, inner: int,
                      precision=None, store=None) -> jax.Array:
    """TWO-LEVEL left-looking blocked lower Cholesky (pad diagonal 1).
    MEASURED NULL — kept only for A/B reruns (scratch/ab_chol5/6.py):
    applying the history at outer width (near-peak gemms, fewer Lbuf
    re-reads) won one session (13.2 vs 16.2 ms bf16 16384) but lost the
    same-session verification sweep on every configuration (flat 14.9 vs
    15.7-18.6 ms); the driver dispatches the flat scheme only."""
    M = a.shape[0]
    sdt = store or a.dtype
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    cdt = jnp.float32 if low else a.dtype
    from ..blas.trinv import tri_inv_lower

    Lbuf = jnp.zeros((M, M), sdt)
    for K0 in range(0, M, outer):
        W = min(outer, M - K0)
        pan = a[K0:, K0:K0 + W].astype(cdt)
        if K0 > 0:
            hist = Lbuf[K0:, :K0]
            row = Lbuf[K0:K0 + W, :K0]
            pan = pan - jnp.matmul(hist, jnp.conj(row.T),
                                   precision=precision,
                                   preferred_element_type=cdt)
        pblk = jnp.zeros((M - K0, W), sdt)
        for j0 in range(0, W, inner):
            w = min(inner, W - j0)
            sub = pan[j0:, j0:j0 + w]
            if j0 > 0:
                ih = pblk[j0:, :j0]
                ir = pblk[j0:j0 + w, :j0]
                sub = sub - jnp.matmul(ih, jnp.conj(ir.T),
                                       precision=precision,
                                       preferred_element_type=cdt)
            l11 = jax.lax.linalg.cholesky(sub[:w], symmetrize_input=False)
            blk = l11.astype(sdt)
            if K0 + j0 + w < M:
                inv11 = tri_inv_lower(l11)
                l21 = jnp.matmul(sub[w:], jnp.conj(inv11.T),
                                 precision=precision,
                                 preferred_element_type=cdt)
                blk = jnp.concatenate([blk, l21.astype(sdt)], axis=0)
            pblk = jax.lax.dynamic_update_slice(pblk, blk, (j0, j0))
        Lbuf = jax.lax.dynamic_update_slice(Lbuf, pblk, (K0, K0))
    return Lbuf


def _prep_hpd(A: DistMatrix, uplo: UpperOrLower) -> jax.Array:
    """Full Hermitian data with identity on the padding diagonal."""
    Af = MakeHermitian(uplo, A.redistribute(MC, MR))
    return _set_pad_diag(Af.data, A.m, 1)


def _set_pad_diag(d: jax.Array, m: int, val) -> jax.Array:
    """Set the padding diagonal (rows/cols >= m) to ``val`` via an
    O(M - m) scatter — a full-matrix `where` pass at N=16384 costs
    several ms of pure HBM bandwidth (measured, scratch/prof_chol2.py)."""
    M = d.shape[0]
    if M <= m:
        return d
    idx = jnp.arange(m, M)
    return d.at[idx, idx].set(jnp.asarray(val, d.dtype))


def _prep_lower_tri(A: DistMatrix, uplo: UpperOrLower) -> jax.Array:
    """Padded data whose LOWER triangle holds the Hermitian matrix and
    whose padding diagonal is 1. Only the lower triangle is meaningful —
    `_chol_lower_rec` never reads above the diagonal, so the reference's
    full MakeHermitian pass (a transposed-read select over the whole
    matrix, ~10 ms of HBM traffic at N=16384) is skipped for LOWER input
    and replaced by one plain adjoint pass for UPPER input."""
    d = A.redistribute(MC, MR).data
    if uplo == UPPER:
        d = jnp.conj(d.T)  # lower(d) <- conj(upper(A))
    return _set_pad_diag(d, A.m, 1)


def _strip_pad_diag(L: jax.Array, m: int) -> jax.Array:
    M = L.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    pad_diag = (i == j) & (i >= m)
    return jnp.where(pad_diag, jnp.zeros((), L.dtype), L)


@functools.partial(jax.jit, static_argnames=('uplo', 'blocksize'))
def _cholesky_jit(uplo: UpperOrLower, A: DistMatrix,
                  blocksize: Optional[int] = None) -> DistMatrix:
    if A.m != A.n:
        raise ValueError("Cholesky requires a square matrix")
    nb = blocksize or Blocksize()
    low_store = A.dtype in (jnp.bfloat16, jnp.float16)
    single = A.grid.size == 1
    if blocksize is None and single:
        # panel-width knees measured on v5e (PERF.md; scratch/ab_chol3/4):
        # the left-looking scheme wants NARROWER panels as N grows — the
        # history product is single-pass MXU while the O(n nb^2) panel
        # chol+trsm work scales with nb. 16384 bf16: nb=512 16.1-18.5 ms
        # vs 1024 19.1; f32: nb=512 36.1 ms vs 1024 38.0 vs 2048 42.1.
        # Below ~12k the wider panels' fewer dispatches win (8192 bf16
        # 1024: 4.4 ms).
        if A.data.shape[0] >= 12288:
            nb = max(nb, 512)
        else:
            nb = max(nb, 1024 if low_store else 2048)
    d = _prep_lower_tri(A, uplo)
    # low-precision storage factors through f32 carriers (XLA's Cholesky
    # has no bf16/f16 kernel; accumulation wants f32 anyway) with the L
    # blocks RETURNED in the storage dtype: the gemm operand reads and
    # the concatenate tree then move half the bytes, and every matmul is
    # single-pass MXU with f32 accumulation — numerically identical to
    # the earlier DEFAULT-precision/f32-carrier scheme
    low = d.dtype in (jnp.bfloat16, jnp.float16)
    store = A.dtype if low else None
    if low:
        prec = jax.lax.Precision.DEFAULT
        if not single:
            # the recursive multi-grid form still wants the f32 carrier
            # up front; the left-looking loop upcasts slice-by-slice
            d = d.astype(jnp.float32)
    elif d.dtype in (jnp.float32, jnp.complex64):
        # f32 carriers: 3-pass bf16x3 panel/update matmuls (~f32-grade
        # operand splitting; measured 1.64x over the library-default
        # 6-pass HIGHEST on v5e) — f64/c128 keep the full default
        prec = jax.lax.Precision.HIGH
    else:
        prec = None
    if single:
        # single chip: FLAT left-looking panel scheme (n^3/3 flops, no
        # concatenate tree — measured fastest; scratch/ab_chol2.py).
        # NULL RESULT (scratch/ab_chol5/6.py): the two-level variant
        # (_chol_lower_left2) beat flat in one session (13.2 vs 16.2 ms
        # bf16 16384) but LOST the full same-session verification sweep
        # (flat 14.9 vs 15.7-18.6 ms across 2048/1536/2560 x 512/384/256;
        # f32 35.2 vs 39.7-40.8) — session-to-session chip/compiler
        # variance, not a real win. Multi-grid keeps the recursive form
        # whose full-size matmuls GSPMD shards well (HLO-verified in
        # tests/core/test_collectives).
        L = _chol_lower_left(d, nb, prec, store)
    else:
        L = _chol_lower_rec(d, nb, prec, store)
    # the factor is already lower-trapezoidal by construction (XLA's
    # cholesky trils its block; the concatenate tree places explicit
    # zeros top-right) and its padding region is zero except the pad
    # diagonal — so the exit cleanup is one O(M - m) scatter, not the
    # two full-matrix masking passes the generic path would use
    Ldm = A.redistribute(MC, MR).with_data(_set_pad_diag(L, A.m, 0))
    if uplo == LOWER:
        return Ldm
    from ..blas.level1 import Adjoint

    return Adjoint(Ldm)


def Cholesky(uplo: UpperOrLower, A: DistMatrix,
             blocksize: Optional[int] = None) -> DistMatrix:
    """Return the Cholesky factor in the uplo triangle
    (reference: Cholesky.cpp:96; LOWER: A = L L^H, UPPER: A = U^H U).

    Raises NonHPDMatrixException when the matrix is numerically non-HPD
    (reference: factor/Cholesky/UpperVariant3.hpp:28-30) — detectable
    eagerly only; inside an enclosing jit the NaNs propagate instead."""
    out = _cholesky_jit(uplo, A, blocksize)
    if not isinstance(out.data, jax.core.Tracer):
        if bool(jnp.any(jnp.isnan(jnp.real(out.data)))):
            raise NonHPDMatrixException()
    return out


def CholeskyPivoted(uplo: UpperOrLower, A: DistMatrix
                    ) -> Tuple[DistMatrix, "jax.Array"]:
    """Diagonally-pivoted (full-pivoted) Cholesky, P A P^T = L L^H
    (reference: factor/Cholesky/PivotedLowerVariant3.hpp). Unblocked
    fori_loop with on-device argmax pivot selection and symmetric
    row/column swaps; rank-revealing for PSD matrices."""
    n = A.m
    d = _prep_hpd(A, uplo)
    M = d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    perm0 = jnp.arange(M, dtype=jnp.int32)

    def _swap_sym(a, i, j):
        ri = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        rj = jax.lax.dynamic_index_in_dim(a, j, 0, keepdims=False)
        a = jax.lax.dynamic_update_index_in_dim(a, rj[None, :], i, 0)
        a = jax.lax.dynamic_update_index_in_dim(a, ri[None, :], j, 0)
        ci = jax.lax.dynamic_index_in_dim(a, i, 1, keepdims=False)
        cj = jax.lax.dynamic_index_in_dim(a, j, 1, keepdims=False)
        a = jax.lax.dynamic_update_index_in_dim(a, cj[:, None], i, 1)
        return jax.lax.dynamic_update_index_in_dim(a, ci[:, None], j, 1)

    eps = jnp.finfo(jnp.real(d).dtype).eps
    tol = eps * n * jnp.maximum(jnp.max(jnp.real(jnp.diagonal(d))[:n]
                                        if n else 1.0), 1.0)

    def step(k, carry):
        a, perm = carry
        dg = jnp.real(jnp.diagonal(a))
        act = (rows >= k) & (rows < n)
        p = jnp.argmax(jnp.where(act, dg, -jnp.inf)).astype(jnp.int32)
        a = _swap_sym(a, k, p)
        t = perm[k]
        perm = perm.at[k].set(perm[p]).at[p].set(t)
        piv = jnp.real(a[k, k])
        # numerically semidefinite: once the best pivot falls below the
        # tolerance, the remaining block is rank-exhausted — zero column
        # (reference's pivoted variant breaks out; fixed-trip here)
        dead = piv <= tol
        safe = jnp.where(dead, jnp.ones((), piv.dtype), piv)
        root = jnp.sqrt(safe).astype(a.dtype)
        col = jax.lax.dynamic_index_in_dim(a, k, 1, keepdims=False)
        below = rows > k
        l = jnp.where(below & ~dead, col / root, jnp.zeros_like(col))
        lk = l.at[k].set(jnp.where(dead, jnp.zeros((), a.dtype), root))
        a = jax.lax.dynamic_update_index_in_dim(a, lk[:, None], k, 1)
        return a - jnp.outer(l, jnp.conj(l)).at[k, :].set(0).at[:, k].set(0), \
            perm

    d, perm = jax.lax.fori_loop(0, n, step, (d, perm0))
    Ldm = A.redistribute(MC, MR).with_data(_strip_pad_diag(d, n))
    Ldm = MakeTrapezoidal(LOWER, Ldm)
    if uplo == UPPER:
        from ..blas.level1 import Adjoint

        Ldm = Adjoint(Ldm)
    from .perm import Permutation

    return Ldm, Permutation(perm, n)


def SolveAfter(uplo: UpperOrLower, orientation: Orientation,
               A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """Solve using a computed Cholesky factor
    (reference: factor/Cholesky/SolveAfter.hpp). A holds the factor in
    uplo; solves A_original X = B via two triangular solves."""
    if uplo == LOWER:
        Y = Trsm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0, A, B)
        return Trsm(LEFT, LOWER, ADJOINT, NON_UNIT, 1.0, A, Y)
    Y = Trsm(LEFT, UPPER, ADJOINT, NON_UNIT, 1.0, A, B)
    return Trsm(LEFT, UPPER, NORMAL, NON_UNIT, 1.0, A, Y)


@functools.partial(jax.jit, static_argnames=('uplo', 'blocksize'))
def ReverseCholesky(uplo: UpperOrLower, A: DistMatrix,
                    blocksize: Optional[int] = None) -> DistMatrix:
    """Reverse factorization (LOWER: A = L^H L; reference:
    factor/Cholesky/ReverseLowerVariant3.hpp) via the flip trick:
    J A J = (J L^H J)(J L J) with J the exchange permutation."""
    # the flipped recursion reads lower(flip(d)) = upper(d): supply the
    # UPPER triangle (one adjoint pass only for LOWER input)
    d = A.redistribute(MC, MR).data
    if uplo == LOWER:
        d = jnp.conj(d.T)  # upper(d) <- conj(lower(A))
    d = _set_pad_diag(d, A.m, 1)
    flipped = d[::-1, ::-1]
    nb = blocksize or Blocksize()
    Lf = _chol_lower_rec(flipped, nb)
    R = Lf[::-1, ::-1]  # upper triangular: A = R R^H (LOWER reverse: L^H L)
    Rdm = A.redistribute(MC, MR).with_data(_set_pad_diag(R, A.m, 0))
    if uplo == UPPER:
        return Rdm
    from ..blas.level1 import Adjoint

    return Adjoint(Rdm)


def CholeskyMod(uplo: UpperOrLower, T: DistMatrix, alpha,
                V: DistMatrix, blocksize: Optional[int] = None
                ) -> DistMatrix:
    """Update a Cholesky factor for A + alpha V V^H in O(n^2 k)
    (reference: factor/Cholesky/Mod.hpp — Givens sweeps for the update,
    hyperbolic rotations for the downdate).

    TPU-native design: the reference's column-sequential rotation sweeps
    are latency-bound on an accelerator (n tiny dependent vector ops per
    V column), so the sweep is BLOCKED into the compound (J-)orthogonal
    panel transform they generate. For each nb-wide panel, with T the
    diagonal block, Vp the panel rows of V and s = sign(alpha):

        T'   = chol(T T^H + s Vp Vp^H)          (nb x nb)
        P    = T^{-1} Vp,  S^H S = I + s P^H P  (k x k)
        L21' = (L21 T^H + s V2 Vp^H) T'^{-H}    (one trailing MXU matmul)
        V2'  = (V2 - L21 P) S^{-1}              (one trailing MXU matmul)

    — algebraically the product of the panel's nb rotations ([T, Vp] is
    mapped to [T', 0] by a (J-)unitary W whose trailing application is
    the two matmuls; J = diag(I, -I) for the downdate). n/nb sequential
    panels of pure MXU work, O(n^2 (nb + k)) FLOPs total. A failed
    downdate (A - |alpha| V V^H not positive definite) surfaces as a
    non-finite factor, as in the reference's failed hyperbolic rotation."""
    if alpha == 0:
        return T.redistribute(MC, MR)
    from ..blas.level1 import Adjoint

    lower = T if uplo == LOWER else Adjoint(T)
    Lm = lower.redistribute(MC, MR)
    n = T.m
    L = _set_pad_diag(Lm.data, n, 1)
    Vm = V.redistribute(MC, MR)
    k = V.n
    sgn = 1.0 if (alpha if not isinstance(alpha, complex) else alpha.real) > 0 else -1.0
    W = Vm.data[:, :k] * jnp.asarray(
        abs(alpha) ** 0.5, Lm.dtype)
    M = L.shape[0]
    nb = min(blocksize or Blocksize(), M)
    s = jnp.asarray(sgn, L.dtype)
    eye_k = jnp.eye(k, dtype=L.dtype)

    for j0 in range(0, M, nb):
        w = min(nb, M - j0)
        Tb = jnp.tril(L[j0:j0 + w, j0:j0 + w])
        Vp = W[j0:j0 + w]
        A11 = local_gemm(Tb, jnp.conj(Tb.T)) \
            + s * local_gemm(Vp, jnp.conj(Vp.T))
        Tn = jax.lax.linalg.cholesky(A11, symmetrize_input=True)
        P = jax.lax.linalg.triangular_solve(
            Tb, Vp, left_side=True, lower=True)
        G = eye_k + s * local_gemm(jnp.conj(P.T), P)
        S = jax.lax.linalg.cholesky(G, symmetrize_input=True)  # G = S S^H
        L = jax.lax.dynamic_update_slice(L, Tn, (j0, j0))
        if j0 + w < M:
            L21 = L[j0 + w:, j0:j0 + w]
            V2 = W[j0 + w:]
            num = local_gemm(L21, jnp.conj(Tb.T)) \
                + s * local_gemm(V2, jnp.conj(Vp.T))
            # X T'^H = num  (right solve against the new diagonal block)
            L21n = jax.lax.linalg.triangular_solve(
                Tn, num, left_side=False, lower=True,
                conjugate_a=True, transpose_a=True)
            V2n = jax.lax.linalg.triangular_solve(
                S, V2 - local_gemm(L21, P), left_side=False, lower=True,
                conjugate_a=True, transpose_a=True)
            L = jax.lax.dynamic_update_slice(L, L21n, (j0 + w, j0))
            W = jax.lax.dynamic_update_slice(W, V2n, (j0 + w, 0))

    out = Lm.with_data(Lm.mask_padding(jnp.tril(L)))
    out = out.with_data(_set_pad_diag(out.data, n, 0))
    return out if uplo == LOWER else Adjoint(out)


def HPDSolve(uplo: UpperOrLower, orientation: Orientation, A: DistMatrix,
             B: DistMatrix, blocksize: Optional[int] = None) -> DistMatrix:
    """Solve A X = B for HPD A (reference: src/lapack_like/solve/HPD.cpp):
    Cholesky + SolveAfter."""
    L = Cholesky(uplo, A, blocksize)
    return SolveAfter(uplo, orientation, L, B)
