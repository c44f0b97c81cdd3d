"""Profile Cholesky components on the attached TPU (axon tunnel).

Times (differential chained-jit method, CLAUDE.md):
  1. full bf16-storage Cholesky recursion at N (current default)
  2. XLA native cholesky base case alone at sizes 512/1024/2048 (chained)
  3. the big trailing GEMM at f32-DEFAULT vs explicit-bf16 operands
  4. batched diag inversion + right-solve panel cost

Run from repo root: python scratch/prof_chol.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401  (precision override)
from elementalx.lapack.cholesky import _chol_lower_rec


def chain_time(make_chain, args, k1=1, k2=4, reps=3):
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
    """Cheap data dependency: perturb a[0,0] by 1e-30*f(out) — a real
    (non-foldable) use of the output; numerically negligible."""
    s = jnp.sum(jnp.real(out)) * 1e-30
    return a.at[0, 0].add(s.astype(a.dtype))


def make_hpd(n, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    a = a @ a.T + 2.0 * np.eye(n, dtype=np.float32)
    return jnp.asarray(a, dtype)


def main():
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices())

    a = make_hpd(N)

    # 1. full recursion, bf16-storage path (f32 carrier, DEFAULT prec)
    for nb in (512, 1024, 2048):
        def mk(k, nb=nb):
            def f(a):
                def body(_, x):
                    L = _chol_lower_rec(x, nb, jax.lax.Precision.DEFAULT)
                    return dep(a, L)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)
        t = chain_time(mk, (a,))
        tf = (N**3 / 3) / t / 1e12
        print(f"chol_rec N={N} nb={nb} DEFAULT: {t*1e3:.1f} ms  {tf:.1f} TF/s")

    # 2. base case alone
    for m in (512, 1024, 2048):
        am = make_hpd(m)
        def mk(k, m=m):
            def f(am):
                def body(_, x):
                    L = jax.lax.linalg.cholesky(x, symmetrize_input=False)
                    return dep(am, L)
                x = jax.lax.fori_loop(0, k, body, am)
                return jnp.sum(x)
            return jax.jit(f)
        t = chain_time(mk, (am,), k1=2, k2=12)
        print(f"xla_chol base m={m}: {t*1e3:.3f} ms")

    # 3. trailing gemm at N/2
    h = N // 2
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((h, h)), jnp.float32)

    def mk_f32(k):
        def f(g):
            def body(_, x):
                y = jax.lax.dot(x, x.T, precision=jax.lax.Precision.DEFAULT)
                return dep(g, y)
            x = jax.lax.fori_loop(0, k, body, g)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_f32, (g,), k1=1, k2=5)
    print(f"gemm f32-DEFAULT {h}: {t*1e3:.2f} ms  {2*h**3/t/1e12:.1f} TF/s")

    gb = g.astype(jnp.bfloat16)

    def mk_bf(k):
        def f(gb):
            def body(_, x):
                y = jax.lax.dot(x, x.T, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                return dep(gb, y)
            x = jax.lax.fori_loop(0, k, body, gb)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(f)

    t = chain_time(mk_bf, (gb,), k1=1, k2=5)
    print(f"gemm bf16-ops->f32 {h}: {t*1e3:.2f} ms  {2*h**3/t/1e12:.1f} TF/s")

    # 3b. f32 carrier, explicit bf16 casts inside (storage f32)
    def mk_cast(k):
        def f(g):
            def body(_, x):
                xb = x.astype(jnp.bfloat16)
                y = jax.lax.dot(xb, xb.T, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                return dep(g, y)
            x = jax.lax.fori_loop(0, k, body, g)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_cast, (g,), k1=1, k2=5)
    print(f"gemm f32-carrier-explicit-bf16 {h}: {t*1e3:.2f} ms  "
          f"{2*h**3/t/1e12:.1f} TF/s")

    # 4. right-solve panel at top level (h x h)
    from elementalx.blas.trsm import _right_solve_adjoint_lower
    tri = jnp.tril(make_hpd(h)) + 2 * jnp.eye(h, dtype=jnp.float32)

    def mk_rs(k):
        def f(tri, g):
            def body(_, x):
                y = _right_solve_adjoint_lower(
                    tri, x, 1024, precision=jax.lax.Precision.DEFAULT)
                return dep(g, y)
            x = jax.lax.fori_loop(0, k, body, g)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_rs, (tri, g), k1=1, k2=4)
    print(f"right_solve panel {h}: {t*1e3:.2f} ms  {h**3/t/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
