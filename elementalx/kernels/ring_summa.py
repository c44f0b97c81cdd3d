"""Device-initiated ring SUMMA — the NVSHMEM-GEMM analogue.

Reference: src/hydrogen/blas/nvshmem_gemm/ (4.3k LoC CUDA+NVSHMEM,
SURVEY §2.2): one-sided GPU-initiated redistribution + SUMMA with
ring allgatherv kernels (DataRedistribution.hpp:196-210), selected at
runtime by EXP_ALG inside SUMMA_NNC (Gemm/NN.hpp:421-436).

TPU-native form: a Pallas kernel in which each device *itself* moves
its B block around the ICI ring with async remote DMA
(pltpu.make_async_remote_copy), double-buffered so step s's MXU matmul
overlaps the transfer of step s+1's block — the same
communication-initiated-by-the-kernel design NVSHMEM provides on GPUs,
without host-driven collectives.

Layout: 1-D ring over all devices; A row-block (M/p, K) stationary,
B row-blocks (K/p, N) circulate; C row-block (M/p, N) accumulates
A[:, k-block(holder)] @ B_block per step.

Validated in the Pallas interpreter on a virtual multi-device mesh
(tests/kernels); on real multi-chip hardware the same kernel rides ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import MC, MR


def _ring_kernel(p: int, kb: int, a_ref, b_ref, out_ref, comm_buf,
                 acc, send_sems, recv_sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    my = jax.lax.axis_index("ring").astype(jnp.int32)
    pp = jnp.int32(p)
    right = jax.lax.rem(my + jnp.int32(1), pp)

    # load our own B block into slot 0
    comm_buf[0] = b_ref[:]
    acc[:] = jnp.zeros_like(acc)

    def step(s, _):
        s = s.astype(jnp.int32)
        # 3-slot rotation: the recv dependency chain bounds neighbour lag
        # to one step, so a slot is never overwritten while being read
        slot = jax.lax.rem(s, jnp.int32(3))
        nxt = jax.lax.rem(s + jnp.int32(1), jnp.int32(3))

        @pl.when(s < p - 1)
        def _():
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[slot],
                dst_ref=comm_buf.at[nxt],
                send_sem=send_sems.at[slot],
                recv_sem=recv_sems.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()

        # block currently held originated at rank (my - s) mod p
        holder = jax.lax.rem(my - s + pp, pp)
        a_slice = a_ref[:, pl.ds(holder * kb, kb)]
        acc[:] += jnp.dot(a_slice, comm_buf[slot],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

        @pl.when(s < p - 1)
        def _():
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[slot],
                dst_ref=comm_buf.at[nxt],
                send_sem=send_sems.at[slot],
                recv_sem=recv_sems.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.wait()

        return 0

    jax.lax.fori_loop(0, p, step, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


def ring_summa(A: DistMatrix, B: DistMatrix, *, interpret: bool = False
               ) -> DistMatrix:
    """C = A @ B with kernel-initiated ring communication over all
    devices of the grid (flattened to a 1-D ring)."""
    from jax import shard_map
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    g = A.grid
    p = g.size
    devs = np.asarray(g.mesh.devices).reshape(-1)
    ring = Mesh(devs, ("ring",))
    An = A.redistribute(MC, MR).canonical()
    Bn = B.redistribute(MC, MR).canonical()
    M, K = An.data.shape
    N = Bn.data.shape[1]
    if K % p or M % p:
        raise ValueError("ring_summa needs p-divisible padded dims")
    kb = K // p
    Ad = jax.device_put(An.data, NamedSharding(ring, P("ring", None)))
    Bd = jax.device_put(Bn.data, NamedSharding(ring, P("ring", None)))

    def per_device(a_loc, b_loc):
        return pl.pallas_call(
            functools.partial(_ring_kernel, p, kb),
            out_shape=jax.ShapeDtypeStruct((M // p, N), An.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((3, kb, N), An.dtype),
                pltpu.VMEM((M // p, N), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                collective_id=13, has_side_effects=True),
        )(a_loc, b_loc)

    out = shard_map(per_device, mesh=ring,
                    in_specs=(P("ring", None), P("ring", None)),
                    out_specs=P("ring", None), check_vma=False)(Ad, Bd)
    out = jax.device_put(out, g.sharding(MC, MR))
    return DistMatrix.from_padded(out, An.m, Bn.n, MC, MR, g, A.wrap)
