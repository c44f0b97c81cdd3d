"""Distributed GEMM: C := alpha op(A) op(B) + beta C.

Reference: src/blas_like/level3/Gemm.cpp + Gemm/{NN,NT,TN,TT}.hpp
(SURVEY §3.3). The reference implements SUMMA stationary-A/B/C/Dot over
MPI allgathers plus Cannon's algorithm; algorithm choice by aspect ratio
(NN.hpp:910-931).

TPU-native design
-----------------
Two execution styles, both over the ('mc','mr') mesh:

* ``GEMM_XLA`` (default): annotate operand/output shardings and hand the
  contraction to XLA's SPMD partitioner, which emits the same
  allgather/reduce-scatter schedules SUMMA hand-codes, fused and
  pipelined over ICI. This is the idiomatic path and the fast one.

* Explicit ``shard_map`` algorithms mirroring the reference's variants,
  used for parity, testing, and schedule control:
    - stationary-C: A row-panels allgathered over 'mr', B col-panels over
      'mc', local MXU matmul accumulate (NN.hpp:325-368).
    - stationary-A: B resharded to [MR,*]; partial products
      reduce-scattered over 'mr' (psum_scatter).
    - stationary-B: A resharded to [*,MC]; partials reduce-scattered
      over 'mc'.
    - dot: A -> [*,VC], B -> [VC,*]; full psum (k >> m,n case).
    - Cannon: initial skew + ring ppermute shifts on a square grid
      (NN.hpp:21-103).

Orientations are normalised to NN by (cheap, fusable) transposes rather
than the reference's 4-way NN/NT/TN/TT code split.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.dmatrix import DistMatrix, apply_sharding, check_same_grid
from ..core.environment import Blocksize
from ..core.types import (
    ADJOINT,
    GEMM_CANNON,
    GEMM_DEFAULT,
    GEMM_SUMMA_A,
    GEMM_SUMMA_B,
    GEMM_SUMMA_C,
    GEMM_SUMMA_DOT,
    GEMM_XLA,
    GemmAlgorithm,
    MC,
    MR,
    NORMAL,
    Orientation,
    TRANSPOSE,
)

# Matmul precision for f32 on the MXU: HIGHEST = full f32 (3-pass bf16).
_PRECISION = jax.lax.Precision.HIGHEST


def set_local_precision(p) -> None:
    global _PRECISION
    _PRECISION = p


def hot_precision(dtype):
    """MXU precision for accuracy-tolerant hot-loop matmuls (trailing
    updates, panel solves): single-pass for low-precision storage (the
    operands are already truncated), bf16x3 operand splitting for
    f32/c64 (~f32-grade; measured 1.64x over the 6-pass HIGHEST library
    default on v5e — PERF.md Cholesky row), and the full library
    default for f64/c128."""
    dt = jnp.dtype(dtype)
    if dt in (jnp.bfloat16, jnp.float16):
        return jax.lax.Precision.DEFAULT
    if dt in (jnp.float32, jnp.complex64):
        return jax.lax.Precision.HIGH
    return None


def local_gemm(a: jax.Array, b: jax.Array, *, precision=None) -> jax.Array:
    """Local-block matmul on the MXU (the blas::Gemm/cublas::Gemm analogue,
    Gemm.cpp:83-160). bf16/f16 inputs accumulate in f32."""
    prec = _PRECISION if precision is None else precision
    acc = jnp.float32 if a.dtype in (jnp.bfloat16, jnp.float16) else None
    out = jnp.matmul(a, b, precision=prec, preferred_element_type=acc)
    return out.astype(a.dtype)


def _orient(X: DistMatrix, orientation: Orientation) -> DistMatrix:
    from .level1 import Adjoint, Transpose

    if orientation == NORMAL:
        return X
    if orientation == TRANSPOSE:
        return Transpose(X)
    if orientation == ADJOINT:
        return Adjoint(X)
    raise ValueError(orientation)


def _accumulate(C: Optional[DistMatrix], prod_dm: DistMatrix, alpha, beta) -> DistMatrix:
    dt = prod_dm.dtype
    if C is None or (isinstance(beta, (int, float)) and beta == 0):
        out = prod_dm.with_data(prod_dm.data * jnp.asarray(alpha, dt))
        if C is not None:
            out = DistMatrix.from_padded(out.data.astype(C.dtype), C.m, C.n,
                                         C.col_dist, C.row_dist, C.grid, C.wrap)
        return out
    Cd = C.redistribute(MC, MR)
    data = (jnp.asarray(alpha, dt) * prod_dm.data.astype(dt)
            + jnp.asarray(beta, dt) * Cd.data.astype(dt)).astype(C.dtype)
    return Cd.with_data(data)


# ---------------------------------------------------------------------------
# GSPMD path
# ---------------------------------------------------------------------------


def _gemm_xla(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Let the SPMD partitioner plan the contraction; constrain the output
    to [MC,MR]."""
    g = A.grid
    prod = local_gemm(A.data, B.data)
    return apply_sharding(prod, g.sharding(MC, MR))


# ---------------------------------------------------------------------------
# Explicit SUMMA variants (shard_map)
# ---------------------------------------------------------------------------


def _mesh(A: DistMatrix):
    return A.grid.mesh


def _summa_c(A: DistMatrix, B: DistMatrix, blocksize: int) -> jax.Array:
    """Stationary-C SUMMA (reference: gemm::SUMMA_NNC, NN.hpp:325-368).

    Loops over k-panels; each step allgathers an A column-panel over 'mr'
    (-> [MC,*]) and a B row-panel over 'mc' (-> [*,MR]) and accumulates a
    local MXU matmul."""
    mesh = _mesh(A)
    r, c = A.grid.height, A.grid.width
    K = A.data.shape[1]
    # a panel must live within a single owner row/column block, so nb must
    # divide both K//c and K//r (static; pick a divisor near the request)
    kmax = min(K // c, K // r)
    nb = min(blocksize, kmax)
    while kmax % nb != 0:
        nb -= 1
    nsteps = K // nb

    def body(a_loc, b_loc):
        # a_loc: (M/r, K/c); b_loc: (K/r, N/c)
        M_loc, N_loc = a_loc.shape[0], b_loc.shape[1]
        mycol = jax.lax.axis_index("mr")
        myrow = jax.lax.axis_index("mc")

        def step(i, acc):
            k0 = i * nb
            # owner column of A panel cols [k0, k0+nb) under block layout
            a_owner = k0 // (K // c)
            a_local_k = k0 - a_owner * (K // c)
            a_panel = jax.lax.dynamic_slice(
                a_loc, (0, a_local_k), (M_loc, nb))
            a_panel = jnp.where(mycol == a_owner, a_panel,
                                jnp.zeros_like(a_panel))
            a_panel = jax.lax.psum(a_panel, "mr")  # broadcast from owner col
            b_owner = k0 // (K // r)
            b_local_k = k0 - b_owner * (K // r)
            b_panel = jax.lax.dynamic_slice(
                b_loc, (b_local_k, 0), (nb, N_loc))
            b_panel = jnp.where(myrow == b_owner, b_panel,
                                jnp.zeros_like(b_panel))
            b_panel = jax.lax.psum(b_panel, "mc")  # broadcast from owner row
            return acc + local_gemm(a_panel, b_panel)

        acc0 = jax.lax.pcast(jnp.zeros((M_loc, N_loc), a_loc.dtype),
                             ("mc", "mr"), to="varying")
        return jax.lax.fori_loop(0, nsteps, step, acc0)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("mc", "mr"), P("mc", "mr")),
                  out_specs=P("mc", "mr"))
    return f(A.data, B.data)


def _summa_a(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Stationary-A SUMMA (reference: gemm::SUMMA_NNA): B -> [MR,*], local
    partials (M/r, N) reduce-scattered over 'mr'."""
    mesh = _mesh(A)
    g = A.grid
    B_mr = apply_sharding(B.data, NamedSharding(mesh, P("mr", None)))

    def body(a_loc, b_loc):
        # a_loc: (M/r, K/c) where the K block matches my 'mr' index == b rows
        partial = local_gemm(a_loc, b_loc)  # (M/r, N)
        return jax.lax.psum_scatter(partial, "mr", scatter_dimension=1,
                                    tiled=True)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("mc", "mr"), P("mr", None)),
                  out_specs=P("mc", "mr"))
    return f(A.data, B_mr)


def _summa_b(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Stationary-B SUMMA (reference: gemm::SUMMA_NNB): A -> [*,MC], local
    partials (M, N/c) reduce-scattered over 'mc'."""
    mesh = _mesh(A)
    A_sc = apply_sharding(A.data, NamedSharding(mesh, P(None, "mc")))

    def body(a_loc, b_loc):
        partial = local_gemm(a_loc, b_loc)  # (M, N/c)
        return jax.lax.psum_scatter(partial, "mc", scatter_dimension=0,
                                    tiled=True)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, "mc"), P("mc", "mr")),
                  out_specs=P("mc", "mr"))
    return f(A_sc, B.data)


def _summa_dot(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Dot SUMMA for k >> m, n (reference: gemm::SUMMA_NNDot): operands
    vectorized over all p devices along k; one full psum."""
    mesh = _mesh(A)
    g = A.grid
    A_vc = apply_sharding(A.data, NamedSharding(mesh, P(None, ("mc", "mr"))))
    B_vc = apply_sharding(B.data, NamedSharding(mesh, P(("mc", "mr"), None)))

    def body(a_loc, b_loc):
        partial = local_gemm(a_loc, b_loc)  # (M, N) local contribution
        return jax.lax.psum(partial, ("mc", "mr"))

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, ("mc", "mr")), P(("mc", "mr"), None)),
                  out_specs=P(None, None))
    out = f(A_vc, B_vc)
    return apply_sharding(out, g.sharding(MC, MR))


def _cannon(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Cannon's algorithm on a square grid (reference: gemm::Cannon_NN,
    NN.hpp:21-103): skew A left by row index / B up by column index, then
    r steps of local matmul + unit ring shifts via collective-permute."""
    g = A.grid
    r, c = g.height, g.width
    if r != c:
        raise ValueError("Cannon requires a square grid (NN.hpp:23)")
    mesh = _mesh(A)

    def body(a_loc, b_loc):
        row = jax.lax.axis_index("mc")
        col = jax.lax.axis_index("mr")

        def shift(x, axis_name, by):
            n = r
            perm = [(i, (i - by) % n) for i in range(n)]  # send i -> i-by
            return jax.lax.ppermute(x, axis_name, perm)

        # initial skew: A row i shifted left by i; B col j shifted up by j.
        def skew(x, axis_name, steps_fn):
            # ppermute with data-dependent distance isn't expressible;
            # perform the skew as log/linear fixed permutes: rotate k times
            # where ranks with index > k keep rotating. Simpler: a single
            # ppermute with permutation i -> i - idx is rank-dependent, so
            # emulate with r-1 conditional unit rotations.
            def one(kk, xx):
                rotated = jax.lax.ppermute(
                    xx, axis_name, [(i, (i - 1) % r) for i in range(r)])
                keep_rot = steps_fn() > kk
                return jnp.where(keep_rot, rotated, xx)
            return jax.lax.fori_loop(0, r - 1, one, x)

        a = skew(a_loc, "mr", lambda: row)   # shift left by row index
        b = skew(b_loc, "mc", lambda: col)   # shift up by column index

        def step(i, carry):
            a, b, acc = carry
            acc = acc + local_gemm(a, b)
            a = jax.lax.ppermute(a, "mr", [(q, (q - 1) % r) for q in range(r)])
            b = jax.lax.ppermute(b, "mc", [(q, (q - 1) % r) for q in range(r)])
            return (a, b, acc)

        acc0 = jax.lax.pcast(
            jnp.zeros((a_loc.shape[0], b_loc.shape[1]), a_loc.dtype),
            ("mc", "mr"), to="varying")
        _, _, out = jax.lax.fori_loop(0, r, step, (a, b, acc0))
        return out

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("mc", "mr"), P("mc", "mr")),
                  out_specs=P("mc", "mr"))
    return f(A.data, B.data)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


# When True, GEMM_DEFAULT dispatches through the reference's
# aspect-ratio heuristic onto the EXPLICIT SUMMA variants instead of the
# GSPMD path (which otherwise dominates on TPU: XLA plans the same
# collectives itself). Toggle for A/B studies and for meshes where
# manual stationarity beats the compiler's choice.
_EXPLICIT_SUMMA = [False]


def use_explicit_summa(on: bool = True) -> None:
    """Route GEMM_DEFAULT through the aspect-ratio SUMMA heuristic
    (reference: Gemm/NN.hpp:910-931) instead of GSPMD. Clears Gemm's
    jit cache: the choice is made at trace time, so cached
    GEMM_DEFAULT executables would otherwise keep the old dispatch."""
    _EXPLICIT_SUMMA[0] = bool(on)
    Gemm.clear_cache()


def _choose_algorithm(m: int, n: int, k: int, p: int) -> GemmAlgorithm:
    """Aspect-ratio heuristic (reference: NN.hpp:910-931, weight
    towards C = 2): k >> m,n -> Dot (stationary-k accumulation);
    m << n -> stationary-B; n << m -> stationary-A; else stationary-C.
    With GSPMD enabled (the default) XLA's own sharding propagation
    plans equivalent collectives, so GEMM_XLA wins and is returned
    unconditionally; `use_explicit_summa(True)` activates the manual
    dispatch (single-device grids always take GEMM_XLA — the SUMMA
    variants' shard_map needs a real mesh)."""
    if not _EXPLICIT_SUMMA[0] or p == 1:
        return GEMM_XLA
    w = 2
    if w * m <= k and w * n <= k:
        return GEMM_SUMMA_DOT
    if m <= n and w * m <= n:
        return GEMM_SUMMA_B
    if n <= m and w * n <= m:
        return GEMM_SUMMA_A
    return GEMM_SUMMA_C


@functools.partial(jax.jit, static_argnames=('orientA', 'orientB', 'alg', 'blocksize'))
def Gemm(
    orientA: Orientation,
    orientB: Orientation,
    alpha,
    A: DistMatrix,
    B: DistMatrix,
    beta=0.0,
    C: Optional[DistMatrix] = None,
    alg: GemmAlgorithm = GEMM_DEFAULT,
    blocksize: Optional[int] = None,
) -> DistMatrix:
    """C := alpha op(A) op(B) + beta C (reference: Gemm.cpp:279).

    Returns a new [MC,MR] DistMatrix. If C is None, beta must be 0."""
    check_same_grid(A, B, *(() if C is None else (C,)))
    An = _orient(A.redistribute(MC, MR) if A.dist != (MC, MR) else A, orientA)
    Bn = _orient(B.redistribute(MC, MR) if B.dist != (MC, MR) else B, orientB)
    An = An.redistribute(MC, MR).canonical()
    Bn = Bn.redistribute(MC, MR).canonical()
    if C is not None:
        C = C.canonical()
    m, k, n = An.m, An.n, Bn.n
    if Bn.m != k:
        raise ValueError(f"Gemm: inner dims mismatch {An.shape} x {Bn.shape}")

    if alg == GEMM_DEFAULT:
        alg = _choose_algorithm(m, n, k, A.grid.size)

    if alg == GEMM_XLA:
        prod = _gemm_xla(An, Bn)
    elif alg == GEMM_SUMMA_C:
        prod = _summa_c(An, Bn, blocksize or Blocksize())
    elif alg == GEMM_SUMMA_A:
        prod = _summa_a(An, Bn)
    elif alg == GEMM_SUMMA_B:
        prod = _summa_b(An, Bn)
    elif alg == GEMM_SUMMA_DOT:
        prod = _summa_dot(An, Bn)
    elif alg == GEMM_CANNON:
        prod = _cannon(An, Bn)
    else:
        raise ValueError(alg)

    prod_dm = DistMatrix.from_padded(prod, m, n, MC, MR, A.grid, A.wrap)
    return _accumulate(C, prod_dm, alpha, beta)


def Gemm3D(A: DistMatrix, B: DistMatrix, depth: int = 2,
           alpha=1.0) -> DistMatrix:
    """3-D (depth-replicated) GEMM (reference: experimental/g3d/
    G3DGemm.cpp — mesh x depth comm split :16-30, DepthBroadcast :105,
    per-layer product, SumContributions reduce :304).

    The grid's devices are reshaped into an (r', c', depth) mesh; K is
    split across the depth axis, each layer multiplies its K-slab
    locally, and one psum over 'md' reduces the contributions."""
    import numpy as np

    check_same_grid(A, B)
    g = A.grid
    p = g.size
    if p % depth != 0:
        raise ValueError(f"depth {depth} does not divide p={p}")
    p2 = p // depth
    r = 1
    for cand in range(int(p2 ** 0.5), 0, -1):
        if p2 % cand == 0:
            r = cand
            break
    c = p2 // r
    devs = np.asarray(g.mesh.devices).reshape(-1)
    from jax.sharding import Mesh

    mesh3 = Mesh(devs.reshape(r, c, depth), ("mc", "mr", "md"))

    An = A.redistribute(MC, MR).canonical()
    Bn = B.redistribute(MC, MR).canonical()
    if An.n != Bn.m:
        raise ValueError("Gemm3D: inner dimension mismatch")
    M, K = An.data.shape
    N = Bn.data.shape[1]
    # divisibility: K must split over depth*... pad already guarantees
    # multiples of p >= r, c, depth products used here
    Ad = jax.device_put(An.data, NamedSharding(mesh3, P("mc", "md")))
    Bd = jax.device_put(Bn.data, NamedSharding(mesh3, P("md", "mr")))

    def body(a_loc, b_loc):
        part = local_gemm(a_loc, b_loc)   # (M/r, N/c) layer contribution
        return jax.lax.psum(part, "md")

    f = shard_map(body, mesh=mesh3,
                  in_specs=(P("mc", "md"), P("md", "mr")),
                  out_specs=P("mc", "mr"))
    prod = f(Ad, Bd)
    prod = jax.device_put(prod, g.sharding(MC, MR))
    out = DistMatrix.from_padded(prod, An.m, Bn.n, MC, MR, g, A.wrap)
    return out.with_data(out.data * jnp.asarray(alpha, out.dtype))
