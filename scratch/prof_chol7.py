"""Component decomposition of the left-looking Cholesky at N=16384:
(1) the fused Pallas panel tail alone, per panel shape;
(2) the XLA chol+trinv+matmul tail on the same shapes;
(3) the history GEMM rate at representative shapes;
(4) everything-but-tails (driver with free tails) is (1)/(2) subtracted.

Chained differential timing, scalar readbacks (CLAUDE.md).
Run: python scratch/prof_chol7.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(make_chain, args, k1=8, k2=136, reps=3):
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


def t_pallas_tail(Mt, w, low):
    from elementalx.kernels.potrf import potrf_panel_tail

    rng = np.random.default_rng(0)
    g = rng.standard_normal((w, w)).astype(np.float32)
    sym = (g @ g.T + 2 * w * np.eye(w)).astype(np.float32)
    pan = np.tile(sym[:, :w], (Mt // w, 1)).astype(np.float32)

    def mk(k):
        def f(sym, pan):
            def body(_, c):
                s, p = c
                out = potrf_panel_tail(s, p, low_apply=low)
                return s + 1e-30 * out[:w, :w].astype(s.dtype), p
            s, p = jax.lax.fori_loop(0, k, body, (sym, pan))
            return jnp.sum(s)
        return jax.jit(f)

    return chain_time(mk, (jnp.asarray(sym), jnp.asarray(pan)))


def t_xla_tail(Mt, w, low):
    from elementalx.blas.trinv import tri_inv_lower

    rng = np.random.default_rng(0)
    g = rng.standard_normal((w, w)).astype(np.float32)
    sym = (g @ g.T + 2 * w * np.eye(w)).astype(np.float32)
    pan = np.tile(sym[:, :w], (Mt // w, 1)).astype(np.float32)
    prec = jax.lax.Precision.DEFAULT if low else jax.lax.Precision.HIGH

    def mk(k):
        def f(sym, pan):
            def body(_, c):
                s, p = c
                l11 = jax.lax.linalg.cholesky(s, symmetrize_input=False)
                inv11 = tri_inv_lower(l11)
                l21 = jnp.matmul(p[w:], inv11.T.astype(p.dtype),
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
                blk = jnp.concatenate([l11, l21], axis=0)
                return s + 1e-30 * blk[:w, :w].astype(s.dtype), p
            s, p = jax.lax.fori_loop(0, k, body, (sym, pan))
            return jnp.sum(s)
        return jax.jit(f)

    return chain_time(mk, (jnp.asarray(sym), jnp.asarray(pan)))


def t_hist_gemm(Mt, K, w, low):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if low else jnp.float32
    hist = jnp.asarray(rng.standard_normal((Mt, K)), jnp.float32).astype(dt)
    row = jnp.asarray(rng.standard_normal((w, K)), jnp.float32).astype(dt)
    prec = jax.lax.Precision.DEFAULT if low else jax.lax.Precision.HIGH

    def mk(k):
        def f(h, r):
            def body(_, h):
                u = jnp.matmul(h, r.T, precision=prec,
                               preferred_element_type=jnp.float32)
                d = (1e-30 * jnp.sum(u)).astype(h.dtype)
                return h.at[0, 0].add(d)
            h = jax.lax.fori_loop(0, k, body, h)
            return jnp.sum(h[0].astype(jnp.float32))
        return jax.jit(f)

    return chain_time(mk, (hist, row))


def t_hist_sliced(M, k0, w, low):
    """History gemm with SLICED operands out of the square Lbuf — what
    the left-looking driver actually issues. Measures whether XLA
    materializes the (M-k0, k0) bottom-left slice per panel."""
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if low else jnp.float32
    Lbuf = jnp.asarray(rng.standard_normal((M, M)), jnp.float32).astype(dt)
    prec = jax.lax.Precision.DEFAULT if low else jax.lax.Precision.HIGH

    def mk(k):
        def f(L):
            def body(_, L):
                hist = L[k0:, :k0]
                row = L[k0:k0 + w, :k0]
                u = jnp.matmul(hist, row.T, precision=prec,
                               preferred_element_type=jnp.float32)
                d = (1e-30 * jnp.sum(u)).astype(L.dtype)
                return L.at[0, 0].add(d)
            L = jax.lax.fori_loop(0, k, body, L)
            return jnp.sum(L[0].astype(jnp.float32))
        return jax.jit(f)

    return chain_time(mk, (Lbuf,))


def main():
    print("devices:", jax.devices(), flush=True)
    w = 512
    for low in (True, False):
        tag = "bf16" if low else "f32"
        for (Mt, K) in ((16384, 8192), (8192, 4096), (8192, 8192)):
            th = t_hist_gemm(Mt, K, w, low)
            fl = 2 * Mt * K * w
            print(f"[{tag}] hist dense ({Mt},{K})x({K},{w}): "
                  f"{th*1e3:7.3f} ms  {fl/th/1e12:6.1f} TF/s", flush=True)
        for k0 in (8192, 4096):
            th = t_hist_sliced(16384, k0, w, low)
            fl = 2 * (16384 - k0) * k0 * w
            print(f"[{tag}] hist SLICED M=16384 k0={k0}: "
                  f"{th*1e3:7.3f} ms  {fl/th/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
