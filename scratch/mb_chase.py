"""Microbenchmark: per-op cost of the stage-2 bulge-chase primitive.

One chase op (realistic shapes, fake-but-representative math) looped
K times inside ONE pallas_call. Measures the per-op floor that decides
the band->tridiag kernel's feasibility (target: <= ~2 us/op at b=256,
or <= ~3.5 us/op at b=512).

Pieces per op (b = bandwidth):
  - column extract (b,1) + small pack-transpose to (1,b)
  - 3 matvecs vs dense blocks (S b x b, L b x 2b, B b x b)
  - Householder-ish lane math (rsqrt etc.)
  - rank-1/rank-2 updates on S, L, B
  - advance: 2 strided rolls (shear) of (b, 2b) + masked writes
  - v store to a (S_max, b) buffer

Run: python scratch/mb_chase.py [b] [K]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dotg(a, b_, dims):
    return jax.lax.dot_general(a, b_, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def kernel(strip, skl, vout, *, b, K):
    L4 = 4 * b

    def op(t, acc):
        q = jax.lax.rem(t, 8) * 8  # wobble the dynamic offset a bit
        # --- column extract x = strip[q+2b : q+3b, ce] as (b, 1)
        xc = strip[pl.ds(q + 2 * b, b), 2 * b - 1:2 * b]          # (b,1)
        # --- Householder-ish lane math on the column
        sig = jnp.sum(xc * xc)
        alpha = jnp.sum(xc[0:1, 0:1])
        beta = -jnp.sign(alpha) * jnp.sqrt(alpha * alpha + sig)
        vc = xc / (alpha - beta + acc * 1e-30)
        tau = (beta - alpha) / jnp.where(beta == 0, 1.0, beta)
        # --- pack transpose (b,1) -> (1,b)
        vr = vc.reshape(1, b) * 0 + jnp.transpose(vc)              # (1,b)
        # --- matvecs
        S = strip[pl.ds(q + 2 * b, b), pl.ds(2 * b, b)]            # (b,b)
        Lb = strip[pl.ds(q + 2 * b, b), pl.ds(0, 2 * b)]           # (b,2b)
        Bb = strip[pl.ds(q + 3 * b, b), pl.ds(2 * b, b)]           # (b,b)
        u = _dotg(S, vc, ((1,), (0,)))                             # (b,1)
        y = _dotg(vr, Lb, ((1,), (0,)))                            # (1,2b)
        z = _dotg(Bb, vc, ((1,), (0,)))                            # (b,1)
        vtu = jnp.sum(vc * u)
        w = tau * (u - (tau * 0.5 * vtu) * vc)                     # (b,1)
        wr = jnp.transpose(w)                                      # (1,b)
        # --- updates
        strip[pl.ds(q + 2 * b, b), pl.ds(2 * b, b)] = \
            S - vc @ wr - w @ vr
        strip[pl.ds(q + 2 * b, b), pl.ds(0, 2 * b)] = \
            Lb - (tau * vc) @ y
        strip[pl.ds(q + 3 * b, b), pl.ds(2 * b, b)] = \
            Bb - (tau * z) @ vr
        # --- v store
        vout[pl.ds(jax.lax.rem(t, 32), 1), :] = vr
        # --- advance: shear-out retiring rows, shear-in arriving rows
        ret = strip[pl.ds(q, b), pl.ds(0, 2 * b)]
        ret = pltpu.roll(ret, 0, 1, stride=1, stride_axis=0)
        skl[pl.ds(q, b), :] = ret
        arr = skl[pl.ds(q + 2 * b, b), :]
        arr = pltpu.roll(arr, q, 1, stride=1, stride_axis=0)
        strip[pl.ds(q + 3 * b, b), pl.ds(0, 2 * b)] = arr
        return acc + jnp.sum(z) * 1e-30

    acc = jax.lax.fori_loop(0, K, op, jnp.float32(0))
    vout[0:1, 0:1] = acc.reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("b", "K"))
def run(strip0, skl0, b, K):
    return pl.pallas_call(
        functools.partial(kernel, b=b, K=K),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, b), jnp.float32),
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(strip0, skl0)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    key = jax.random.PRNGKey(0)
    strip0 = jax.random.normal(key, (5 * b + 64, 4 * b), jnp.float32)
    skl0 = jax.random.normal(key, (5 * b + 64, 2 * b), jnp.float32)
    for KK in (K // 8, K):
        out = run(strip0, skl0, b, KK)
        float(out[0, 0])
        t0 = time.perf_counter()
        out = run(strip0, skl0, b, KK)
        float(out[0, 0])
        t1 = time.perf_counter()
        print(f"b={b} K={KK}: total {1e3*(t1-t0):.2f} ms", flush=True)
    # differential: (t_K - t_K/8) / (K - K/8)
    ts = {}
    for KK in (K // 8, K):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(strip0, skl0, b, KK)
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        ts[KK] = best
    per = (ts[K] - ts[K // 8]) / (K - K // 8)
    print(f"b={b}: per-op {per*1e6:.2f} us  "
          f"(projected for {8192**2//(2*b)} ops: "
          f"{per*8192**2/(2*b)*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
