"""HLO collective evidence for the GSPMD scaling story.

The copy:: layer is sharding re-annotation (core/redistribute.py) and
the factorizations rely on GSPMD to plan data movement. With no
multi-chip hardware attached, the compiled HLO is the only available
evidence that XLA emits sane collectives — these tests compile key
paths for the 8-virtual-device mesh and assert on the collective ops in
the optimized module text, failing if GSPMD regresses to
replicate-everything (reference plan table:
include/El/blas_like/level1/Copy/, SURVEY §2.2).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import MC, MR, NORMAL, STAR, VC, LOWER

_COLLECTIVES = ("all-gather", "all-to-all", "collective-permute",
                "all-reduce", "reduce-scatter")


def _opt_hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def _collective_stats(hlo: str):
    """{op_kind: [elem_counts]} for every collective in the module."""
    def _elems(dims: str) -> int:
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n

    stats = {k: [] for k in _COLLECTIVES}
    for line in hlo.splitlines():
        for kind in _COLLECTIVES:
            # HLO: "%name = f64[64,256]{0,1} all-gather(...)" (or the
            # async "-start" form; "-done" is not double-counted)
            m = re.search(
                r"=\s*\w+\[([0-9,]*)\]\S*\s+" + kind + r"(-start)?\(",
                line)
            if m:
                stats[kind].append(_elems(m.group(1)))
                continue
            # tuple-valued form: "%x = (f64[..]{..}, f64[..]{..}) all-to-all("
            m = re.search(r"=\s*\(([^)]*)\)\s+" + kind + r"(-start)?\(",
                          line)
            if m:
                total = sum(_elems(g) for g in
                            re.findall(r"\w+\[([0-9,]*)\]", m.group(1)))
                stats[kind].append(total)
    return stats


def _total(stats, *kinds):
    return sum(sum(stats[k]) for k in kinds)


@pytest.fixture(scope="module")
def g():
    return El.Grid(height=4)


def _mk(g, m, n, col=MC, row=MR, seed=0):
    rng = np.random.default_rng(seed)
    return DistMatrix.from_global(
        jnp.asarray(rng.standard_normal((m, n))), col, row, g)


def test_allgather_family(g):
    """[MC,MR] -> [MC,*] must move ~one matrix of data (a row-comm
    allgather), not replicate-everything through host round trips."""
    A = _mk(g, 256, 256)

    def f(A):
        return A.redistribute(MC, STAR).data

    hlo = _opt_hlo(f, A)
    stats = _collective_stats(hlo)
    moved = _total(stats, "all-gather", "all-to-all", "collective-permute",
                   "all-reduce")
    assert moved > 0, "no collective at all — result cannot be distributed"
    # an [MC,*] target holds grid-width copies of each row-block; the
    # combined collective payload must stay within a small factor of the
    # replicated result (not e.g. quadratic blowup)
    assert moved <= 4 * 256 * 256, f"collective payload blown up: {stats}"


def test_alltoall_promote(g):
    """[VC,*] -> [MC,MR] is the classic all-to-all re-layout
    (copy::ColAllToAllDemote plan family)."""
    A = _mk(g, 256, 256, VC, STAR)

    def f(A):
        return A.redistribute(MC, MR).data

    hlo = _opt_hlo(f, A)
    stats = _collective_stats(hlo)
    moved = _total(stats, "all-to-all", "collective-permute", "all-gather")
    assert moved > 0, "VC->MC_MR emitted no data movement"
    assert moved <= 4 * 256 * 256, f"re-layout blew up: {stats}"


def test_contract_reduce_scatter(g):
    """Contract [MC,*] -> [MC,MR] is a sum over redundant ranks: the HLO
    must carry a reduce-scatter or all-reduce (psum family), matching
    Contract.hpp:15-76."""
    from elementalx.blas.contract import Contract

    A = _mk(g, 256, 256, MC, STAR)

    def f(A):
        return Contract(A, MC, MR).data

    hlo = _opt_hlo(f, A)
    stats = _collective_stats(hlo)
    assert _total(stats, "reduce-scatter", "all-reduce",
                  "all-to-all", "collective-permute") > 0, \
        f"no reduction collective in Contract HLO: {stats}"


def test_gemm_summa_collectives(g):
    """A SUMMA Gemm for [MC,MR] operands must communicate O(matrix)
    data, never gather the full product to every rank more than a
    constant number of times (SUMMA_NNC, NN.hpp:325-368)."""
    m = 512
    A = _mk(g, m, m, seed=1)
    B = _mk(g, m, m, seed=2)

    def f(A, B):
        return El.Gemm(NORMAL, NORMAL, 1.0, A, B).data

    hlo = _opt_hlo(f, A, B)
    stats = _collective_stats(hlo)
    moved = _total(stats, *_COLLECTIVES)
    assert moved > 0, "distributed GEMM compiled with no collectives"
    # stationary-C SUMMA moves A over the row comm and B over the col
    # comm once each: ~2 matrices; allow 6x for staging
    assert moved <= 6 * m * m, \
        f"GEMM communication superlinear in the matrix size: {stats}"


def test_cholesky_panel_no_trailing_allgather(g):
    """One Cholesky panel step (diag factor + panel trsm + trailing
    rank-k update) on the mesh: the trailing matrix (~n^2 elements) must
    NOT be all-gathered — only O(panel) = O(n*nb) data may move
    (reference plan: factor/Cholesky/UpperVariant3.hpp:76-124 moves the
    panel to [*,VR]/[*,MC]/[*,MR], never A22)."""
    n, nb = 512, 64
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    A = DistMatrix.from_global(jnp.asarray(a), grid=g)

    def panel_step(A):
        from elementalx.blas.trsm import _right_solve_adjoint_lower

        d = A.data
        a11 = d[:nb, :nb]
        a21 = d[nb:, :nb]
        a22 = d[nb:, nb:]
        l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
        l21 = _right_solve_adjoint_lower(l11, a21, nb)
        upd = a22 - l21 @ l21.T
        # return the pieces sharded (the library's recursion assembles by
        # concatenation; a .at[].set scatter here would provoke GSPMD
        # scatter-rule all-gathers that the real path never performs)
        return l11, l21, upd

    hlo = _opt_hlo(panel_step, A)
    stats = _collective_stats(hlo)
    # permit panel-sized movement with generous staging slack; the
    # trailing matrix is (n-nb)^2 = 200k elements — a replicate-A22 plan
    # would show up as >= that in one collective
    biggest = max((max(v) for v in stats.values() if v), default=0)
    assert biggest < (n - nb) * (n - nb), \
        f"a collective moves the whole trailing matrix: {stats}"


def test_tridiag_symv_moves_vectors_only(g):
    """The HermitianTridiag latrd panel is a chain of trailing-matrix
    symv's. The reference's square-subgrid specialization
    (HermitianTridiag.cpp:82-116) exists to keep that chain's
    communication at O(n) per symv; the GSPMD equivalent claim (PARITY
    §2.4) is that a sharded A @ v moves only VECTOR-sized data (partial
    products psum/all-gathered), never the matrix. This asserts it."""
    n = 1024
    rng = np.random.default_rng(7)
    A = _mk(g, n, n, seed=8)
    v = jnp.asarray(rng.standard_normal((n,)))

    def f(A, v):
        # trailing-block Hermitian matvec as the latrd panel performs it
        return A.data @ v

    hlo = _opt_hlo(f, A, v)
    stats = _collective_stats(hlo)
    moved = _total(stats, *_COLLECTIVES)
    assert moved > 0, "sharded symv compiled without any reduction"
    # vector-sized bound: a few all-gathers/psums of length-n vectors;
    # matrix-sized movement (n^2) would exceed this by ~100x
    assert moved <= 16 * n, f"symv moved matrix-sized data: {stats}"


def test_trsm_no_full_replication(g):
    """Distributed Trsm: communication stays within a small factor of
    the operand sizes (trsm::LLN Large plan, Trsm.cpp:121-157)."""
    from elementalx.core.types import NON_UNIT
    from elementalx.blas.trsm import Trsm
    from elementalx.core.types import LEFT

    n, nrhs = 256, 128
    rng = np.random.default_rng(4)
    t = np.tril(rng.standard_normal((n, n))) + 3 * np.eye(n)
    b = rng.standard_normal((n, nrhs))
    T = DistMatrix.from_global(jnp.asarray(t), grid=g)
    B = DistMatrix.from_global(jnp.asarray(b), grid=g)

    def f(T, B):
        return Trsm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0, T, B).data

    hlo = _opt_hlo(f, T, B)
    stats = _collective_stats(hlo)
    moved = _total(stats, *_COLLECTIVES)
    # the partitioned-inverse solve may stage diag-block inverses and
    # panels; bound total collective payload at ~8x the operands
    assert moved <= 8 * (n * n + n * nrhs), \
        f"Trsm communication blown up: {stats}"


def test_lu_panel_step_no_trailing_replication(g):
    """One LU panel step (slab factor via the two-level tournament
    panel + U12 solve + full-height trailing update) on the mesh: the
    trailing matrix must not be all-gathered — only panel-sized
    (O(n*nb)) movement is allowed (reference plan: LU.cpp:47-98 moves
    A21[MC,*] x A12[*,MR], never the trailing block)."""
    n, nb = 512, 64
    A = _mk(g, n, n, seed=11)

    def panel_step(A):
        from elementalx.blas.gemm import local_gemm
        from elementalx.blas.trinv import tri_inv_lower_unit
        from elementalx.lapack.lu import _lu_slab

        a = A.data
        lu, lperm = _lu_slab(a[:, :nb])
        inv11 = tri_inv_lower_unit(lu[:nb, :])
        U12 = local_gemm(inv11, a[:nb, nb:])
        upd = a[nb:, nb:] - local_gemm(lu[nb:, :], U12)
        return lu, lperm, U12, upd

    hlo = _opt_hlo(panel_step, A)
    stats = _collective_stats(hlo)
    biggest = max((max(v) for v in stats.values() if v), default=0)
    assert biggest < (n - nb) * (n - nb), \
        f"a collective moves the whole trailing matrix: {stats}"


def test_qr_panel_step_no_trailing_replication(g):
    """One QR compact-WY panel step: the two trailing matmuls contract
    over the sharded row dimension (psum/reduce-scatter of panel-sized
    W), never all-gathering the (n x (n-nb)) trailing block
    (reference plan: ApplyPackedReflectors' [VC,*] panel moves)."""
    n, nb = 512, 64
    A = _mk(g, n, n, seed=12)

    def panel_step(A):
        from jax._src.lax.linalg import geqrf

        from elementalx.blas.gemm import hot_precision
        from elementalx.lapack.reflect import (apply_block_reflector,
                                               build_wy_T)

        a = A.data
        pk, t = geqrf(a[:, :nb])
        r2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 1)
        V = jnp.where(r2 > c2, pk, jnp.zeros_like(pk))
        V = jnp.where(r2 == c2, jnp.ones((), a.dtype), V)
        T = build_wy_T(V, t)
        upd = apply_block_reflector(V, T, a[:, nb:], adjoint=True,
                                    precision=hot_precision(a.dtype))
        return pk, upd

    hlo = _opt_hlo(panel_step, A)
    stats = _collective_stats(hlo)
    biggest = max((max(v) for v in stats.values() if v), default=0)
    assert biggest < n * (n - nb), \
        f"a collective moves the whole trailing matrix: {stats}"


@pytest.mark.parametrize("alg_name", ["A", "B", "DOT"])
def test_explicit_summa_collectives(g, alg_name):
    """The explicit shard_map SUMMA variants (stationary-A/B and the
    dot/inner-product form) must each move O(matrix) data — matching
    Gemm/NN.hpp:325-368's per-variant communication profile."""
    from elementalx.core.types import (GEMM_SUMMA_A, GEMM_SUMMA_B,
                                       GEMM_SUMMA_DOT)

    alg = {"A": GEMM_SUMMA_A, "B": GEMM_SUMMA_B,
           "DOT": GEMM_SUMMA_DOT}[alg_name]
    m = 512
    A = _mk(g, m, m, seed=3)
    B = _mk(g, m, m, seed=4)

    def f(A, B):
        return El.Gemm(NORMAL, NORMAL, 1.0, A, B, alg=alg).data

    hlo = _opt_hlo(f, A, B)
    stats = _collective_stats(hlo)
    moved = _total(stats, *_COLLECTIVES)
    assert moved > 0, f"SUMMA-{alg_name} compiled with no collectives"
    # each variant keeps one operand stationary and moves the other two
    # across one comm each; allow staging overhead
    assert moved <= 8 * m * m, \
        f"SUMMA-{alg_name} communication superlinear: {stats}"


def test_gemm3d_depth_reduction(g):
    """Gemm3D splits K over the depth axis and must reduce the layer
    contributions (psum over 'md') — G3DGemm.cpp:304's
    SumContributions."""
    m = 256
    A = _mk(g, m, m, seed=5)
    B = _mk(g, m, m, seed=6)

    def f(A, B):
        return El.blas.Gemm3D(A, B, depth=2).data

    hlo = _opt_hlo(f, A, B)
    stats = _collective_stats(hlo)
    red = _total(stats, "all-reduce", "reduce-scatter")
    assert red > 0, f"Gemm3D emitted no depth reduction: {stats}"
    assert _total(stats, *_COLLECTIVES) <= 10 * m * m, \
        f"Gemm3D communication superlinear: {stats}"


def test_block_gemm_matched_layout_no_extra_movement(g):
    """BlockGemm with matching inner layouts+cuts runs DIRECTLY on the
    permuted shards (Block.hpp:20-218 native dispatch): its HLO must not
    move more data than the identical element-wrap Gemm — the owner
    permutations cancel, so there is NO unwind/rewrap gather."""
    from elementalx.core.block import BlockGemm, BlockMatrix
    import jax

    # the native zero-movement path needs A.col_perm == B.row_perm,
    # which requires a SQUARE process grid (row wraps use g.height,
    # column wraps g.width) — take a 2x2 subgrid
    gsq = El.Grid(devices=jax.devices()[:4], height=2)
    m = 256
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((m, m)))
    b = jnp.asarray(rng.standard_normal((m, m)))
    Ab = BlockMatrix.from_element(DistMatrix.from_global(a, grid=gsq),
                                  bh=16, bw=16)
    Bb = BlockMatrix.from_element(DistMatrix.from_global(b, grid=gsq),
                                  bh=16, bw=16)
    assert np.all(Ab.col_perm == Bb.row_perm), "fixture must match layouts"

    def f_block(ad, bd):
        A2 = BlockMatrix(Ab.dm.with_data(ad), Ab.row_perm, Ab.col_perm,
                         Ab.block_height, Ab.block_width, Ab.m, Ab.n,
                         Ab.row_cut, Ab.col_cut)
        B2 = BlockMatrix(Bb.dm.with_data(bd), Bb.row_perm, Bb.col_perm,
                         Bb.block_height, Bb.block_width, Bb.m, Bb.n,
                         Bb.row_cut, Bb.col_cut)
        return BlockGemm(1.0, A2, B2).dm.data

    def f_elem(ad, bd):
        A2 = Ab.dm.with_data(ad)
        B2 = Bb.dm.with_data(bd)
        return El.Gemm(NORMAL, NORMAL, 1.0, A2, B2).data

    moved_block = _total(
        _collective_stats(_opt_hlo(f_block, Ab.dm.data, Bb.dm.data)),
        *_COLLECTIVES)
    moved_elem = _total(
        _collective_stats(_opt_hlo(f_elem, Ab.dm.data, Bb.dm.data)),
        *_COLLECTIVES)
    assert moved_block <= moved_elem, (
        f"matched-layout BlockGemm moved MORE than the element Gemm: "
        f"{moved_block} vs {moved_elem}")
