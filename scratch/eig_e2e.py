"""End-to-end HermitianEig 8192 f32 on the TPU with stage decomposition
(VERDICT r4 item 3: record the e2e number at the retuned latrd ts=1024
gate, same session as the stage A/Bs).

Run from repo root:
  python -u scratch/eig_e2e.py          # full driver + stages
  python -u scratch/eig_e2e.py xla      # force the XLA latrd panel
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(mk, args, k1=1, k2=3, reps=3):
    f1, f2 = mk(k1), mk(k2)
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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    if mode == "xla":
        import elementalx.kernels.common as KC
        KC.on_tpu = lambda: False
        mode = "xla-panel"
    print("devices:", jax.devices(), "mode:", mode, flush=True)

    import elementalx as El
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    from elementalx.lapack.condense import HermitianTridiag
    from elementalx.lapack.hermitian_eig import HermitianEig, HermitianEigCtrl

    ctrl = HermitianEigCtrl()
    if mode == "latrd":
        ctrl = HermitianEigCtrl(tridiag_alg="latrd")

    N = int(os.environ.get("N", 8192))
    rng = np.random.default_rng(1)
    a = rng.standard_normal((N, N)).astype(np.float32)
    a = (a + a.T) / 2
    grid = El.Grid(devices=jax.devices())
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    # ---- stage 1: tridiag only ----
    if mode in ("latrd", "xla-panel"):
        def mk_tri(k):
            def f(x):
                def body(_, xx):
                    fact = HermitianTridiag(LOWER, A.with_data(xx))
                    s = (jnp.sum(fact.d) + jnp.sum(fact.e)
                         + jnp.sum(fact.tau.real)) * 1e-30
                    return xx + s.astype(xx.dtype)
                y = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(y[0])
            return jax.jit(f)
    else:
        from elementalx.lapack.sbr import sbr_tridiag

        def mk_tri(k):
            def f(x):
                def body(_, xx):
                    fact = sbr_tridiag(xx, b=256)
                    s = (jnp.sum(fact.d) + jnp.sum(fact.e)) * 1e-30
                    return xx + s.astype(xx.dtype)
                y = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(y[0])
            return jax.jit(f)

    t_tri = chain_time(mk_tri, (A.data,))
    print(f"tridiag N={N} [{mode}]: {t_tri*1e3:.1f} ms", flush=True)

    # ---- full driver (vectors) ----
    def mk_eig(k):
        def f(x):
            def body(_, xx):
                w, Q = HermitianEig(LOWER, A.with_data(xx), vectors=True,
                                    ctrl=ctrl)
                s = (jnp.sum(w) + jnp.sum(Q.data[0, :8])) * 1e-30
                return xx + s.astype(xx.dtype)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0])
        return jax.jit(f)

    t_eig = chain_time(mk_eig, (A.data,), k1=1, k2=2)
    print(f"hermitian_eig N={N} [{mode}]: {t_eig*1e3:.1f} ms", flush=True)

    # residual check (one eager run)
    w, Q = HermitianEig(LOWER, A, vectors=True, ctrl=ctrl)
    qd = Q.data[:N, :N]
    R = jnp.matmul(jnp.asarray(a), qd, precision=jax.lax.Precision.HIGHEST) \
        - qd * w[None, :]
    rel = float(jnp.max(jnp.abs(R))) / max(float(jnp.max(jnp.abs(w))), 1e-30)
    print(f"resid max|AQ-Qw|/|w|max = {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
