"""Distributed LU factorization with partial (and full) pivoting.

Reference: src/lapack_like/factor/LU.cpp:47-98 (dist driver),
factor/LU/Panel.hpp:68-158 (distributed pivoted panel: per-column MaxLoc
AllReduce over the column comm + row-swap broadcast), LU/Full.hpp (full
pivoting via global MaxAbsLoc), factor/LU/SolveAfter.hpp.

TPU-native design: a fori_loop over column panels on the padded global
array; the pivot search is a masked argmax (XLA lowers the reduction +
the psum over 'mc'), row swaps are two dynamic row scatters, and the
trailing update is one full-size masked MXU matmul per panel — the
analogue of the reference's A21[MC,*] x A12[*,MR] LocalGemm. The pivot
decisions never leave the device (SURVEY §7 hard-parts: fixed-trip loops
+ masked selects)."""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.environment import Blocksize
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    TRANSPOSE,
    UNIT,
    UPPER,
)
from ..blas.gemm import hot_precision, local_gemm
from ..blas.trinv import tri_inv_lower_unit
from ..blas.trsm import Trsm
from .perm import Permutation


def _swap_rows(a: jax.Array, i, j) -> jax.Array:
    ri = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
    rj = jax.lax.dynamic_index_in_dim(a, j, axis=0, keepdims=False)
    a = jax.lax.dynamic_update_index_in_dim(a, rj[None, :], i, axis=0)
    return jax.lax.dynamic_update_index_in_dim(a, ri[None, :], j, axis=0)


_LU_PANEL_BASE = 16

_SLAB_INNER = 512

# XLA:TPU's LuDecompositionBlock custom-call stages the whole panel in
# scoped VMEM; panels taller than ~8k rows overflow the 16 MB limit
# (measured: (16384,128), (12288,128) and even (16384,64) fail while
# (10240,128)/(8192,*) compile; a vmapped batch of two 8192-row chunks
# fails too, so the tournament factors its chunks SEQUENTIALLY).
# Above this height the panel routes through the CALU-style tournament.
# The chunk height sits well BELOW the compile limit: the custom call
# has a measured cost cliff above ~4k rows ((4096,256): ~0 ms,
# (8192,256): 1.31 ms, (8192,512): 2.59 ms — scratch/prof_getrf.py),
# so four sequential ~free 4096-row getrfs + a (4*w, w) playoff beat
# one 8192-row call. Sequential beats vmapped batching here too
# ((4x4096,256) vmapped: 3.07 ms).
_GETRF_CHUNK = 4096


def _pallas_getrf_ok(shape, dtype) -> bool:
    """Route a panel getrf through the fused Pallas kernel
    (kernels/getrf.py) when it fits VMEM and tiles cleanly. XLA's
    LuDecompositionBlock charges ~0.56 ns per panel element; the fused
    kernel factors the chunk out of VMEM in one shot."""
    import os

    if os.environ.get("ELX_NO_PALLAS_GETRF"):
        return False
    from ..kernels.common import on_tpu

    Mt, w = shape
    return (on_tpu() and dtype == jnp.float32
            and w % 128 == 0 and Mt % 128 == 0
            and Mt * w * 4 <= 16 * 2 ** 20)


def _getrf_flat(sub: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """VMEM-sized getrf: fused Pallas kernel on TPU, XLA elsewhere."""
    if _pallas_getrf_ok(sub.shape, sub.dtype):
        from ..kernels.getrf import pallas_getrf

        return pallas_getrf(sub)
    lu, _, lperm = jax.lax.linalg.lu(sub)
    return lu, lperm


def _getrf_tall(sl: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Tournament-pivoted LU of a very tall panel (Mt, w) — the CALU
    scheme (Grigori/Demmel/Xiang): partition rows into chunks, factor
    each chunk with XLA's native getrf (batched), stack every chunk's
    w winning pivot rows, and factor the stack to elect the final
    pivot set; L for all rows is then one MXU gemm against inv(U).
    Threshold (not strict partial) pivoting — the standard
    communication-avoiding trade, backward stable in practice.
    Returns (packed, lperm) with the _lu_slab contract."""
    Mt, w = sl.shape
    # the fused Pallas kernel has no row-height custom-call cliff, so
    # when it handles a double-height chunk, halve the tournament depth
    H = _GETRF_CHUNK
    if _pallas_getrf_ok((2 * H, w), sl.dtype):
        H = 2 * H
    if Mt <= H:
        lu, _, lperm = jax.lax.linalg.lu(sl)
        return lu, lperm
    nc = -(-Mt // H)
    Mp = nc * H
    slp = jnp.concatenate(
        [sl, jnp.zeros((Mp - Mt, w), sl.dtype)]) if Mp > Mt else sl
    # sequential chunk getrfs (a vmapped batch overflows scoped VMEM)
    cands = []
    for c in range(nc):
        _, cp = _getrf_flat(slp[c * H:(c + 1) * H])
        cands.append(cp[:w] + c * H)
    cand = jnp.concatenate(cands)                         # (nc*w,)
    stack = jnp.take(slp, cand, axis=0, unique_indices=True)
    slu, sperm = _getrf_flat(stack)
    win = jnp.take(cand, sperm, axis=0, unique_indices=True)  # (nc*w,)
    P = win[:w]
    # A padded zero row can only win the tournament over an exactly
    # singular panel; remap any winner >= Mt onto an unused real row so
    # lperm stays a permutation of [0, Mt) (the factorization is
    # already rank-deficient there — validity of the permutation is
    # what matters).
    pad_win = P >= Mt
    inP0 = jnp.zeros((Mp,), bool).at[P].set(True)
    free = jnp.nonzero(~inP0[:Mt], size=Mt, fill_value=Mt - 1)[0]
    repl = jnp.clip(jnp.cumsum(pad_win.astype(jnp.int32)) - 1, 0, Mt - 1)
    P = jnp.where(pad_win, free[repl].astype(P.dtype), P)
    U = jnp.triu(slu[:w, :])
    # L for every row: A U^{-1} (unit on the pivot rows by construction)
    from ..blas.trinv import tri_inv_upper

    L_all = local_gemm(sl, tri_inv_upper(U, precision=hot_precision(sl.dtype)),
                       precision=hot_precision(sl.dtype))
    # composed permutation: winners first (tournament order), then the
    # remaining REAL rows in ascending original order
    inP = jnp.zeros((Mp,), bool).at[P].set(True)
    rest = jnp.nonzero(
        ~inP[:Mt], size=Mt - w, fill_value=Mt - 1)[0].astype(jnp.int32)
    lperm = jnp.concatenate([P, rest])
    packed = jnp.concatenate(
        [slu[:w, :], jnp.take(L_all, rest, axis=0, unique_indices=True)],
        axis=0)
    return packed, lperm


def _getrf(sub: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Native getrf when the panel fits scoped VMEM, tournament above.
    The fused Pallas kernel has no custom-call height cliff, so any
    panel it can hold (16 MB transposed copy, e.g. 8192x512) factors in
    ONE kernel call with TRUE partial pivoting, skipping the tournament
    playoff entirely. (A 32 MB full-height 16384x512 attempt OOMed
    scoped VMEM: Mosaic spilled 120 MB of registers at Mt=16384.)"""
    if _pallas_getrf_ok(sub.shape, sub.dtype):
        return _getrf_flat(sub)
    if sub.shape[0] > _GETRF_CHUNK:
        return _getrf_tall(sub)
    return _getrf_flat(sub)


def _lu_slab(sl: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Pivoted LU of a tall slab (Mt x w), equivalent to
    ``lu, _, lperm = jax.lax.linalg.lu(sl)`` but built from 128-wide
    XLA-native getrf sub-panels with slab-confined trailing updates.

    Rationale (PERF.md): XLA's LuDecomposition expander is fast at
    width <= 128 (~0.04 ms for 8192x128 — its vectorized base case) but
    pays ~2 ms of internal substitution machinery at width 512; this
    two-level scheme reaches ~3x cheaper wide panels. Returns the
    packed slab factor (rows in pivoted order) and the composed row
    permutation ``lperm`` (logical -> original slab row)."""
    Mt, w = sl.shape
    ib = _SLAB_INNER
    if w <= ib or w % ib != 0:
        return _getrf(sl)
    hp = hot_precision(sl.dtype)
    rm = jnp.arange(Mt, dtype=jnp.int32)
    for t in range(w // ib):
        j0 = t * ib
        sub = sl[j0:, j0:j0 + ib]
        lu, lp = _getrf(sub)
        # physically reorder the slab tail (small: Mt x w) and record
        tail = jnp.take(sl[j0:, :], lp, axis=0, unique_indices=True)
        sl = jax.lax.dynamic_update_slice(sl, tail, (j0, 0))
        rm = jax.lax.dynamic_update_slice(
            rm, jnp.take(rm[j0:], lp, axis=0, unique_indices=True), (j0,))
        sl = jax.lax.dynamic_update_slice(sl, lu, (j0, j0))
        rest = w - j0 - ib
        if rest <= 0:
            continue
        inv11 = tri_inv_lower_unit(lu[:ib, :], precision=hp)
        U12 = local_gemm(inv11, sl[j0:j0 + ib, j0 + ib:],
                         precision=hp)
        sl = jax.lax.dynamic_update_slice(sl, U12, (j0, j0 + ib))
        A22 = sl[j0 + ib:, j0 + ib:] - local_gemm(lu[ib:, :], U12,
                                                  precision=hp)
        sl = jax.lax.dynamic_update_slice(sl, A22, (j0 + ib, j0 + ib))
    return sl, rm


def _apply_pivots(blk: jax.Array, pivots: jax.Array, k0j: int, w: int
                  ) -> jax.Array:
    """Apply the recorded swap sequence (row jc <-> pivots[jc] for
    jc in [k0j, k0j+w), in order) to a row block."""
    def body(j, blk):
        jc = k0j + j
        return _swap_rows(blk, jc, pivots[jc])

    return jax.lax.fori_loop(0, w, body, blk)


def _lu_panel(a: jax.Array, perm: jax.Array, k0: int, nb: int, m: int
              ) -> Tuple[jax.Array, jax.Array]:
    """Pivoted factorization of columns [k0, k0+nb) over rows >= k0
    (reference: LU/Panel.hpp:68-158) via XLA's native getrf on the
    static row slice — the analogue of the reference calling the vendor
    LAPACK on local panels (SURVEY §2.6); the column-sequential pivot
    loop is latency-bound on TPU and XLA's composite runs it ~50x
    faster than an op-by-op fori_loop (measured: ~1 ms per (8192,128)
    panel vs ~25 us/column). The composed local permutation is applied
    to the full width in one gather. (Used by the conformance test; the
    LU driver itself keeps rows in physical positions and permutes once
    at the end — see LU.) Padding rows hold zeros (and 1 on the padding
    diagonal), so pivot selection never prefers them over live rows."""
    M = a.shape[0]
    sl = a[k0:, k0:k0 + nb]
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    lu, piv, lperm = jax.lax.linalg.lu(sl.astype(jnp.float32) if low else sl)
    if low:
        lu = lu.astype(a.dtype)
    tail = jnp.take(a[k0:, :], lperm, axis=0, unique_indices=True)
    a = jax.lax.dynamic_update_slice(a, tail, (k0, 0))
    ptail = jnp.take(perm[k0:], lperm, axis=0, unique_indices=True)
    perm = jax.lax.dynamic_update_slice(perm, ptail, (k0,))
    a = jax.lax.dynamic_update_slice(a, lu, (k0, k0))
    return a, perm


def _lu_panel_loop(a: jax.Array, perm: jax.Array, k0: int, nb: int, m: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Two-level blocked fallback panel (masked fori_loops; see
    _lu_panel for why the XLA-native path is preferred)."""
    M = a.shape[0]
    panel = jax.lax.dynamic_slice(a, (0, k0), (M, nb))
    pivots0 = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    ib = _LU_PANEL_BASE if nb % _LU_PANEL_BASE == 0 else nb
    nib = nb // ib
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0)
    pc_ib = jax.lax.broadcasted_iota(jnp.int32, (ib,), 0)

    def inner_block(t, carry):
        panel, pivots, perm = carry
        j0 = t * ib
        sub = jax.lax.dynamic_slice(panel, (0, j0), (M, ib))

        def col_step(j, carry2):
            sub, pivots, perm = carry2
            jc = k0 + j0 + j
            col = jax.lax.dynamic_index_in_dim(sub, j, axis=1,
                                               keepdims=False)
            allowed = (rows >= jc) & ((rows < m) | (rows == jc))
            mag = jnp.where(allowed, jnp.abs(col),
                            -jnp.ones((), jnp.abs(col).dtype))
            p = jnp.argmax(mag).astype(jnp.int32)
            sub = _swap_rows(sub, jc, p)
            pivots = pivots.at[jc].set(p)
            pi = perm[jc]
            perm = perm.at[jc].set(perm[p]).at[p].set(pi)
            col = jax.lax.dynamic_index_in_dim(sub, j, axis=1,
                                               keepdims=False)
            diag = jax.lax.dynamic_index_in_dim(col, jc, axis=0,
                                                keepdims=False)
            safe = jnp.where(diag == 0, jnp.ones((), diag.dtype), diag)
            below = rows > jc
            l = jnp.where(below, col / safe, jnp.zeros_like(col))
            sub = jax.lax.dynamic_update_index_in_dim(
                sub, jnp.where(below, l, col)[:, None], j, axis=1)
            urow = jax.lax.dynamic_index_in_dim(sub, jc, axis=0,
                                                keepdims=False)
            upd = jnp.outer(l, jnp.where(pc_ib > j, urow,
                                         jnp.zeros_like(urow)))
            return sub - upd, pivots, perm

        sub, pivots, perm = jax.lax.fori_loop(
            0, ib, col_step, (sub, pivots, perm))
        # replay this block's swaps on the whole panel, then restore the
        # factored sub (overwriting the doubly-swapped block)
        panel = _apply_pivots(panel, pivots, k0 + j0, ib)
        panel = jax.lax.dynamic_update_slice(panel, sub, (0, j0))
        # U12 := inv(L11) A12 on the panel's remaining columns
        L11 = jax.lax.dynamic_slice(panel, (k0 + j0, j0), (ib, ib))
        Arow = jax.lax.dynamic_slice(panel, (k0 + j0, 0), (ib, nb))
        U12f = jax.lax.linalg.triangular_solve(
            L11, Arow, left_side=True, lower=True, unit_diagonal=True)
        right = pcols >= j0 + ib
        U12 = jnp.where(right[None, :], U12f, Arow)
        panel = jax.lax.dynamic_update_slice(panel, U12, (k0 + j0, 0))
        below = rows >= k0 + j0 + ib
        Lcol = jax.lax.dynamic_slice(panel, (0, j0), (M, ib))
        L21 = jnp.where(below[:, None], Lcol, jnp.zeros_like(Lcol))
        U12m = jnp.where(right[None, :], U12, jnp.zeros_like(U12))
        return panel - local_gemm(L21, U12m), pivots, perm

    panel, pivots, perm = jax.lax.fori_loop(
        0, nib, inner_block, (panel, pivots0, perm))
    # replay the swap sequence across the full width, then overwrite the
    # panel columns with the factored (already-swapped) panel
    a = _apply_pivots(a, pivots, k0, nb)
    a = jax.lax.dynamic_update_slice(a, panel, (0, k0))
    return a, perm


@functools.partial(jax.jit, static_argnames=('blocksize',))
def LU(A: DistMatrix, blocksize: Optional[int] = None
       ) -> Tuple[DistMatrix, Permutation]:
    """Partially-pivoted LU: returns (packed LU, P) with P A = L U, unit L
    below the diagonal (reference: LU.cpp:47-98)."""
    if A.m != A.n:
        # the reference supports rectangular LU; the packed loop below does
        # too (panels run over min(m, n))
        pass
    Am = A.redistribute(MC, MR)
    a = Am.data
    M = a.shape[0]
    m = min(A.m, A.n)
    nb = blocksize or Blocksize()
    if blocksize is None and A.grid.size == 1 and M >= 2048:
        # measured on v5e (PERF.md): each panel iteration carries ~1 ms
        # of fixed gather/scatter cost, so wide panels win on one chip
        # (8192 f32: 84.6 ms at nb=128 -> 59.0 ms at nb=1024 with the
        # two-level _lu_slab panel)
        nb = max(nb, 1024)
    nb = max(1, min(nb, M))
    while M % nb != 0:
        nb -= 1
    # pad diagonal to 1 so padding panels are trivial
    i2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.ones((), a.dtype), a)
    nblk = (m + nb - 1) // nb
    perm0 = jnp.arange(M, dtype=jnp.int32)

    rowsv = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)

    # Rows stay in their PHYSICAL (original) positions for the whole
    # factorization — no trailing-matrix row movement at all. `rowmap`
    # tracks logical->physical order; each panel is gathered into
    # logical order, factored by XLA's native getrf, and scattered back;
    # the trailing update subtracts a physically-scattered L21 (zero
    # rows for already-pivoted positions) with one full-height MXU
    # matmul. A single global row gather at the end produces the packed
    # pivoted layout. Rationale: permuting the trailing block each panel
    # (either swap-by-swap or as composed gathers) was measured at
    # 89.7-122 ms for n=8192 f32 — the unfused (M-k0) x rest gathers /
    # latency-bound row swaps dominate; this scheme moves only panel
    # columns (O(M nb) per panel) and accepts ~1.5x trailing-matmul
    # FLOPs from full-height updates.
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    hp = hot_precision(a.dtype)
    rowmap = perm0
    N = a.shape[1]
    # U12 block-rows are written in LOGICAL (pivoted) order into a
    # separate output buffer `uout` — logical rows [k0, k0+nb) are
    # final once panel k retires (later panels only permute rows >=
    # k0+nb), so the write is a plain dense dynamic-update-slice. This
    # removes the U12 row scatter into the trailing matrix (a full
    # M x rest copy per panel when XLA cannot alias it). The panel
    # columns' factor (whose L21 multiplier rows DO keep being
    # reordered by later pivoting) stays scattered at physical
    # positions in `a`; one global row gather at the end plus a
    # block-mask select stitches the two together.
    #
    # NULL RESULT (measured on-chip, 2026-08-21): a LEFT-looking
    # physical-rows variant — history applied to the current panel
    # only, pan = A(:,J) - Lphys(:,:k0) @ U(:k0,J), exactly 2N^3/3
    # flops vs this scheme's N^3 full-height trailing updates, and
    # panel-only writes — measured 318.8 ms vs 249.0 for this scheme
    # at 16384 f32. Decomposition (scratch/prof_lu2.py): its history
    # gemms cost 167.8 ms vs 82.2 for the right-looking trailing
    # updates despite 2/3 the flops — the (M x k0) x nb narrow-output
    # huge-K gemm shape runs ~17 TF/s effective under HIGH precision
    # (operand re-reads dominate), while the wide trailing updates
    # stream at ~53 TF/s. Flop count is not the binding resource here;
    # gemm SHAPE is.
    uout = jnp.zeros_like(a)
    for k in range(nblk):
        k0 = k * nb
        tail = rowmap[k0:]
        cols = a[:, k0:k0 + nb]
        sl = jnp.take(cols, tail, axis=0, unique_indices=True)
        lu, lperm = _lu_slab(sl.astype(jnp.float32) if low else sl)
        if low:
            lu = lu.astype(a.dtype)
        tail = jnp.take(tail, lperm, axis=0, unique_indices=True)
        rowmap = jax.lax.dynamic_update_slice(rowmap, tail, (k0,))
        cols = cols.at[tail].set(lu, unique_indices=True)
        a = jax.lax.dynamic_update_slice(a, cols, (0, k0))
        rest = N - k0 - nb
        if rest <= 0:
            continue
        L11 = lu[:nb, :]
        # batched log-depth inversion (blas/trinv.py): XLA's
        # TriangularSolve substitution cost ~0.5-1 ms per panel here
        inv11 = tri_inv_lower_unit(L11, precision=hp)
        right = a[:, k0 + nb:]
        prow = tail[:nb]
        Arow = jnp.take(right, prow, axis=0, unique_indices=True)
        U12 = local_gemm(inv11, Arow, precision=hp)
        uout = jax.lax.dynamic_update_slice(uout, U12, (k0, k0 + nb))
        Lphys = jnp.zeros((M, nb), a.dtype).at[tail[nb:]].set(
            lu[nb:, :], unique_indices=True)
        right = right - local_gemm(Lphys, U12, precision=hp)
        a = jax.lax.dynamic_update_slice(a, right, (0, k0 + nb))
    a = jnp.take(a, rowmap, axis=0, unique_indices=True)
    # overlay the logical-order U12 block-rows (block j > block i)
    a = jnp.where(j2 >= (i2 // nb + 1) * nb, uout, a)
    perm = rowmap
    # restore zero padding diagonal
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.zeros((), a.dtype), a)
    out = Am.with_data(Am.mask_padding(a))
    return out, Permutation(perm, A.m)


def LUFullPiv(A: DistMatrix, blocksize: Optional[int] = None
              ) -> Tuple[DistMatrix, Permutation, Permutation]:
    """Fully-pivoted LU, P A Q^T = L U (reference: LU/Full.hpp): unblocked
    with a global MaxAbsLoc per step."""
    Am = A.redistribute(MC, MR)
    a = Am.data
    M, N = a.shape
    m = min(A.m, A.n)
    i2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.ones((), a.dtype), a)
    rowsv = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    colsv = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    rp0 = jnp.arange(M, dtype=jnp.int32)
    cp0 = jnp.arange(N, dtype=jnp.int32)

    def step(k, carry):
        a, rp, cp = carry
        act = (i2 >= k) & (j2 >= k) & (i2 < m) & (j2 < m)
        mag = jnp.where(act, jnp.abs(a), -jnp.ones((), jnp.abs(a).dtype))
        flat = jnp.argmax(mag)
        pi = (flat // N).astype(jnp.int32)
        pj = (flat % N).astype(jnp.int32)
        a = _swap_rows(a, k, pi)
        a = _swap_rows(a.T, k, pj).T
        t = rp[k]
        rp = rp.at[k].set(rp[pi]).at[pi].set(t)
        t = cp[k]
        cp = cp.at[k].set(cp[pj]).at[pj].set(t)
        col = jax.lax.dynamic_index_in_dim(a, k, axis=1, keepdims=False)
        diag = col[k]
        safe = jnp.where(diag == 0, jnp.ones((), diag.dtype), diag)
        below = rowsv > k
        l = jnp.where(below, col / safe, jnp.zeros_like(col))
        a = jax.lax.dynamic_update_index_in_dim(
            a, jnp.where(below, l, col)[:, None], k, axis=1)
        urow = jax.lax.dynamic_index_in_dim(a, k, axis=0, keepdims=False)
        u = jnp.where(colsv > k, urow, jnp.zeros_like(urow))
        return a - jnp.outer(l, u), rp, cp

    a, rp, cp = jax.lax.fori_loop(0, m, step, (a, rp0, cp0))
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.zeros((), a.dtype), a)
    out = Am.with_data(Am.mask_padding(a))
    return out, Permutation(rp, A.m), Permutation(cp, A.n)


def SolveAfter(orientation: Orientation, LUpacked: DistMatrix,
               P: Permutation, B: DistMatrix) -> DistMatrix:
    """Solve A X = B given P A = L U (reference: LU/SolveAfter.hpp)."""
    if orientation == NORMAL:
        Pb = P.apply_rows(B.redistribute(MC, MR))
        Y = Trsm(LEFT, LOWER, NORMAL, UNIT, 1.0, LUpacked, Pb)
        return Trsm(LEFT, UPPER, NORMAL, NON_UNIT, 1.0, LUpacked, Y)
    # A^T X = B  =>  U^T L^T P X = B
    Y = Trsm(LEFT, UPPER, orientation, NON_UNIT, 1.0, LUpacked, B)
    Z = Trsm(LEFT, LOWER, orientation, UNIT, 1.0, LUpacked, Y)
    return P.apply_rows(Z.redistribute(MC, MR), inverse=True)


def LinearSolve(A: DistMatrix, B: DistMatrix,
                blocksize: Optional[int] = None) -> DistMatrix:
    """General solve via pivoted LU (reference: solve/Linear.cpp)."""
    F, P = LU(A, blocksize)
    return SolveAfter(NORMAL, F, P, B)


def LUMod(F: DistMatrix, P: Permutation, u, v, conjugate: bool = True,
          tau: float = 0.1) -> Tuple[DistMatrix, Permutation]:
    """Rank-one update of a partially-pivoted LU factorization:
    given P A = L U, produce P' (A + u v^H) = L' U'
    (reference: factor/LU/Mod.hpp — the Schwetlick-Kielbasinski update
    per Stange/Griewank/Bollhoefer, with threshold-tau pairwise pivoting;
    at most 2*minDim-1 extra swaps).

    Two O(m) sweeps of pairwise row eliminations, each step a masked
    full-row/column vector op (VPU work) with on-device pivot decisions.
    Requires square-or-wide A (height <= width), as in the reference."""
    m, n = F.m, F.n
    if m > n:
        raise ValueError("LUMod assumes height(A) <= width(A) (Mod.hpp)")
    minDim = m
    Fm = F.redistribute(MC, MR)
    d = Fm.data
    Mp, Np = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (Mp,), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Np,), 0)
    dt = d.dtype
    # explicit unit-L (Mp x Mp) and U (Mp x Np)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 1)
    L = jnp.where(i2 > j2, d[:, :Mp], jnp.zeros((), dt))
    L = jnp.where(i2 == j2, jnp.ones((), dt), L)
    U = jnp.triu(d)
    uvec = jnp.zeros((Mp,), dt).at[:m].set(jnp.asarray(u, dt).ravel()[:m])
    vvec = jnp.zeros((Np,), dt).at[:n].set(jnp.asarray(v, dt).ravel()[:n])
    if conjugate:
        vvec = jnp.conj(vvec)
    perm = P.perm.astype(jnp.int32)

    # w := inv(L) P u
    w = uvec[perm]
    w = jax.lax.linalg.triangular_solve(
        L, w[:, None], left_side=True, lower=True, unit_diagonal=True)[:, 0]
    usub0 = jnp.zeros((Mp,), dt)

    def getcol(M_, j):
        return jax.lax.dynamic_index_in_dim(M_, j, axis=1, keepdims=False)

    def setcol(M_, j, c):
        return jax.lax.dynamic_update_index_in_dim(M_, c[:, None], j, axis=1)

    def getrow(M_, i):
        return jax.lax.dynamic_index_in_dim(M_, i, axis=0, keepdims=False)

    def setrow(M_, i, r):
        return jax.lax.dynamic_update_index_in_dim(M_, r[None, :], i, axis=0)

    def _pair_step(L, U, w_i, w_ip1, lam_sub, ups_ii, ups_sub, i, pivot,
                   sweep1):
        """Shared pivot/no-pivot elimination on (L, U) for rows (i, i+1).
        Returns (L, U, new_w_i, new_usub_i)."""
        below = rows > i + 1
        right = cols > i

        li = getcol(L, i)
        lip1 = getcol(L, i + 1)
        ui = getrow(U, i)
        uip1 = getrow(U, i + 1)

        # ---------------- no-pivot branch ---------------- (guarded
        # divisions: the unselected branch may divide by zero)
        def _safe(a, b):
            return a / jnp.where(b == 0, jnp.ones((), dt), b)

        gamma_np = jnp.where(sweep1, _safe(w_ip1, w_i),
                             _safe(ups_sub, ups_ii))
        li_np = li + gamma_np * jnp.where(below, lip1, 0) \
            + gamma_np * jnp.where(rows == i + 1, jnp.ones((), dt), 0)
        uip1_np = uip1 - gamma_np * jnp.where(right, ui, 0)
        usub_np = jnp.where(sweep1, -gamma_np * ups_ii, jnp.zeros((), dt))
        wi_np = w_i

        # ---------------- pivot branch ----------------
        gamma_p = jnp.where(sweep1, _safe(w_i, w_ip1),
                            _safe(ups_ii, ups_sub))
        lam_ii = 1.0 + gamma_p * lam_sub
        # L columns (rows >= i+2): swap + combine
        li_sw = jnp.where(below, lip1 + gamma_p * li, 0)
        lip1_sw = jnp.where(below, li, 0)
        # L rows strictly left of column i: swap rows i, i+1
        # U rows (cols >= i+1): swap + combine
        ui_new = jnp.where(right, uip1, 0)
        uip1_new = jnp.where(right, ui - gamma_p * uip1, 0)
        eta = _safe(lam_sub, lam_ii)
        delta_i = lam_ii
        delta_ip1 = 1.0 - eta * gamma_p
        lip1_f = _safe(lip1_sw - eta * li_sw, delta_ip1)
        li_f = _safe(li_sw, delta_i)
        # unit diagonal + subdiagonal entry gamma/delta_i
        li_f = jnp.where(rows == i, jnp.ones((), dt), li_f)
        li_f = jnp.where(rows == i + 1, _safe(gamma_p, delta_i), li_f)
        lip1_f = jnp.where(rows == i + 1, jnp.ones((), dt), lip1_f)
        ui_f = (ui_new + eta * uip1_new) * delta_i
        uip1_f = uip1_new * delta_ip1
        diag_val = jnp.where(sweep1, eta * ups_ii * delta_i,
                             ups_sub * delta_i)
        ui_f = jnp.where(cols == i, diag_val, ui_f)
        usub_p = jnp.where(sweep1, ups_ii * delta_ip1, jnp.zeros((), dt))
        wi_p = w_ip1 * delta_i

        # ---------------- select ----------------
        li_out = jnp.where(pivot, li_f, li_np)
        lip1_out = jnp.where(pivot, lip1_f, lip1)
        ui_out = jnp.where(pivot, ui_f, ui)
        uip1_out = jnp.where(pivot, uip1_f, uip1_np)

        Lo = setcol(setcol(L, i, li_out), i + 1, lip1_out)
        # swap the strictly-left L rows when pivoting
        lrow_i = getrow(Lo, i)
        lrow_ip1 = getrow(Lo, i + 1)
        left = cols[:Mp] < i
        lrow_i_new = jnp.where(pivot & left, lrow_ip1, lrow_i)
        lrow_ip1_new = jnp.where(pivot & left, lrow_i, lrow_ip1)
        Lo = setrow(setrow(Lo, i, lrow_i_new), i + 1, lrow_ip1_new)
        Uo = setrow(setrow(U, i, ui_out), i + 1, uip1_out)
        return Lo, Uo, jnp.where(pivot, wi_p, wi_np), \
            jnp.where(pivot, usub_p, usub_np)

    # ---- sweep 1: reduce w to a multiple of e0 (i = minDim-2 .. 0) ----
    def sweep1_body(t, carry):
        L, U, w, usub, perm = carry
        i = minDim - 2 - t
        lam_sub = getcol(L, i)[i + 1]
        ups_ii = getrow(U, i)[i]
        w_i = w[i]
        w_ip1 = w[i + 1]
        pivot = jnp.abs(w_i) < tau * jnp.abs(lam_sub * w_i + w_ip1)
        L2, U2, wi_new, usub_i = _pair_step(
            L, U, w_i, w_ip1, lam_sub, ups_ii, jnp.zeros((), dt), i, pivot,
            jnp.asarray(True))
        w = w.at[i].set(wi_new).at[i + 1].set(jnp.zeros((), dt))
        usub = usub.at[i].set(usub_i)
        pi = perm[i]
        perm = jnp.where(pivot,
                         perm.at[i].set(perm[i + 1]).at[i + 1].set(pi), perm)
        return L2, U2, w, usub, perm

    L, U, w, usub, perm = jax.lax.fori_loop(
        0, max(minDim - 1, 0), sweep1_body, (L, U, w, usub0, perm))

    # ---- add w[0] v^H into row 0 of U ----
    U = U.at[0, :].add(w[0] * vvec)

    # ---- sweep 2: Hessenberg -> triangular (i = 0 .. minDim-2) ----
    def sweep2_body(i, carry):
        L, U, usub, perm = carry
        lam_sub = getcol(L, i)[i + 1]
        ups_ii = getrow(U, i)[i]
        ups_sub = usub[i]
        pivot = jnp.abs(ups_ii) < tau * jnp.abs(lam_sub * ups_ii + ups_sub)
        L2, U2, _, _ = _pair_step(
            L, U, jnp.zeros((), dt), jnp.zeros((), dt), lam_sub, ups_ii,
            ups_sub, i, pivot, jnp.asarray(False))
        pi = perm[i]
        perm = jnp.where(pivot,
                         perm.at[i].set(perm[i + 1]).at[i + 1].set(pi), perm)
        return L2, U2, usub, perm

    L, U, usub, perm = jax.lax.fori_loop(
        0, max(minDim - 1, 0), sweep2_body, (L, U, usub, perm))

    # repack: unit-L strictly below the diagonal + U
    packed = jnp.where(i2 > j2, L, jnp.zeros((), dt))
    packed = jnp.pad(packed, ((0, 0), (0, Np - Mp))) + U
    out = Fm.with_data(Fm.mask_padding(packed))
    return out, Permutation(perm, F.m)
