"""Component-level Cholesky cost breakdown on the TPU (small programs,
fast compiles): sequential base cases, diag-inv trees, prep/mask passes.
Run from repo root; serialize with other jobs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401


def chain_time(make_chain, args, k1=1, k2=5, reps=3):
    f1, f2 = make_chain(k1), make_chain(k2)
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def dep(a, out):
    s = jnp.sum(jnp.real(out).astype(jnp.float32)) * 1e-30
    return a.at[0, 0].add(s.astype(a.dtype))


def main():
    rng = np.random.default_rng(0)

    # 1. sixteen SEQUENTIALLY-dependent XLA cholesky calls at 1024 f32
    for m, reps_in in ((1024, 16), (2048, 8)):
        a = rng.standard_normal((m, m)).astype(np.float32) / np.sqrt(m)
        a = jnp.asarray(a @ a.T + 2 * np.eye(m, dtype=np.float32))

        def mk(k, a_shape=m, r=reps_in):
            def f(a):
                def body(_, x):
                    def inner(j, y):
                        L = jax.lax.linalg.cholesky(
                            y, symmetrize_input=False)
                        return dep(y, L)
                    return jax.lax.fori_loop(0, r, inner, x)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (a,))
        print(f"{reps_in} x xla_chol({m}) f32: {t*1e3:.2f} ms "
              f"({t*1e3/reps_in:.3f} ms each)", flush=True)

    # 2. the full-matrix prep/mask passes at 16384
    N = 16384
    big = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

    def mk_prep(k):
        def f(a):
            def body(_, x):
                i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
                h = jnp.where(j > i, jnp.conj(x.T), x)     # MakeHermitian
                h = jnp.where((i == j) & (i >= N), 1.0, h)  # pad diag
                return dep(a, h)
            x = jax.lax.fori_loop(0, k, body, a)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_prep, (big,), k1=1, k2=4)
    print(f"prep-pass (hermitian+mask) 16384 f32: {t*1e3:.2f} ms",
          flush=True)

    # 3. batched diag-inv trees as the recursion performs them
    from elementalx.blas.trsm import _batched_diag_inv, _prep_triangle

    tri = jnp.asarray(np.tril(rng.standard_normal((8192, 8192))).astype(
        np.float32) + 3 * np.eye(8192, dtype=np.float32))

    def mk_inv(k):
        def f(T):
            def body(_, x):
                inv = _batched_diag_inv(x, 1024, 8, True)
                return dep(x, inv)
            x = jax.lax.fori_loop(0, k, body, T)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_inv, (tri,), k1=1, k2=5)
    print(f"batched_diag_inv 8x1024 (one level): {t*1e3:.2f} ms",
          flush=True)

    # 4. pure big-gemm ladder mimicking the recursion's update tree
    #    (sizes n/2, 2 x n/4, 4 x n/8 with bf16 operands, f32 out)
    hb = (jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16),
          jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16),
          jnp.asarray(rng.standard_normal((2048, 2048)), jnp.bfloat16))

    def mk_ladder(k):
        def f(b8, b4, b2):
            def body(_, carry):
                x8, x4, x2 = carry
                y8 = jnp.matmul(x8, x8.T, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                y4 = jnp.matmul(x4, x4.T, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                y2 = jnp.matmul(x2, x2.T, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                return (dep(x8, y8), dep(x4, y4.astype(jnp.bfloat16) * 1),
                        dep(x2, y2))
            c = jax.lax.fori_loop(0, k, body, (b8, b4, b2))
            return sum(jnp.sum(t.astype(jnp.float32)) for t in c)
        return jax.jit(f)

    t = chain_time(mk_ladder, hb, k1=1, k2=5)
    fl = 2 * (8192 ** 3 + 2 * 4096 ** 3 + 4 * 2048 ** 3)
    # note: only 1 of each size here; scale by update multiplicity
    print(f"gemm ladder (8192+4096+2048): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
