"""Validate the panel-fused Pallas latrd kernel (kernels/latrd.py)
against the XLA panel (`condense._tridiag_panel`) and a full-reduction
f64 oracle, in interpreter mode on CPU or compiled on the TPU.

Run from repo root:
  python scratch/ab_latrd.py            # CPU interpreter correctness
  python scratch/ab_latrd.py tpu        # on-chip correctness + timing
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_TPU = len(sys.argv) > 1 and sys.argv[1] in ("tpu", "xla", "sweep")
FORCE_XLA = len(sys.argv) > 1 and sys.argv[1] == "xla"
import jax
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def check_panel(M, nb, ts, k0, w, interpret):
    from elementalx.kernels.latrd import latrd_panel
    from elementalx.lapack.condense import _tridiag_panel

    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, M)).astype(np.float32)
    a = a + a.T
    aj = jnp.asarray(a)
    P, W, tau = latrd_panel(aj, k0, w, nb=nb, ts=ts, interpret=interpret)
    P, W, tau = np.asarray(P), np.asarray(W), np.asarray(tau)

    # XLA reference panel on the same trailing block
    at = aj[k0:, k0:]
    Mt = at.shape[0]
    V0 = jnp.zeros((Mt, w), jnp.float32)
    W0 = jnp.zeros((Mt, w), jnp.float32)
    tau0 = jnp.zeros((M,), jnp.float32)
    at2, V2, W2, tau2 = _tridiag_panel(aj, at, V0, W0, tau0, k0, w, Mt)
    at2, V2, W2, tau2 = (np.asarray(x) for x in (at2, V2, W2, tau2))

    ref_cols = at2[:, :w]
    got_cols = P[k0:, :w]
    sc = max(np.max(np.abs(ref_cols)), 1e-30)
    dP = np.max(np.abs(got_cols - ref_cols)) / sc
    dW = np.max(np.abs(W[k0:, :w] - W2[:, :w])) / max(np.max(np.abs(W2)), 1e-30)
    dT = np.max(np.abs(tau[:w] - tau2[k0:k0 + w]))
    print(f"M={M} ts={ts} k0={k0} w={w}: dP {dP:.2e} dW {dW:.2e} dtau {dT:.2e}",
          flush=True)
    assert dP < 5e-5 and dW < 5e-5 and dT < 5e-5, (dP, dW, dT)


def check_full(M, nb):
    """Full HermitianTridiag through the driver: T must be similar to A
    (f64 oracle via eigenvalue comparison)."""
    import elementalx as El
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    from elementalx.lapack.condense import HermitianTridiag
    import scipy.linalg as sla

    rng = np.random.default_rng(1)
    a = rng.standard_normal((M, M)).astype(np.float32)
    a = (a + a.T) / 2
    grid = El.Grid(devices=jax.devices()[:1])
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    fact = HermitianTridiag(LOWER, A, blocksize=nb)
    d = np.asarray(fact.d, np.float64)[:M]
    e = np.asarray(fact.e, np.float64)[:M - 1]
    w_t = sla.eigh_tridiagonal(d, e, eigvals_only=True)
    w_a = np.linalg.eigvalsh(a.astype(np.float64))
    err = np.max(np.abs(np.sort(w_t) - w_a)) / max(np.max(np.abs(w_a)), 1e-30)
    print(f"full tridiag M={M}: eig err {err:.2e}", flush=True)
    assert err < 5e-5, err


def time_tridiag(M, nb):
    import elementalx as El
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    from elementalx.lapack.condense import HermitianTridiag

    rng = np.random.default_rng(1)
    a = rng.standard_normal((M, M)).astype(np.float32)
    a = (a + a.T) / 2
    grid = El.Grid(devices=jax.devices())
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    def mk(k):
        def f(x):
            def body(_, xx):
                fact = HermitianTridiag(LOWER, A.with_data(xx), blocksize=nb)
                s = (jnp.sum(fact.d) + jnp.sum(fact.e)
                     + jnp.sum(fact.tau.real)) * 1e-30
                return xx + s.astype(xx.dtype)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0])
        return jax.jit(f)

    f1, f2 = mk(1), mk(3)
    float(f1(A.data)); float(f2(A.data))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(A.data))
        t1 = time.perf_counter(); float(f2(A.data))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 2)
    print(f"tridiag M={M} nb={nb}: {best*1e3:.1f} ms", flush=True)


def time_panels(M, nb, ts):
    """Panel-only sweep: every latrd panel of an (M, M) reduction,
    chained in one jit (the trailing rank-2 GEMMs are ~6 ms of the
    ~1.3 s total at 8192, so panel time ~= driver time)."""
    from elementalx.kernels.latrd import latrd_panel

    rng = np.random.default_rng(1)
    a = rng.standard_normal((M, M)).astype(np.float32)
    a = (a + a.T) / 2
    aj = jnp.asarray(a)
    nblk = M // nb - 1

    def mk(k):
        def f(x):
            # feed each rep's scalar back into the matrix so XLA cannot
            # hoist the (otherwise loop-invariant) panel chain
            def rep(_, xx):
                def pan(b, s):
                    P, W, tau = latrd_panel(xx, b * nb, nb, nb=nb, ts=ts)
                    return s + jnp.sum(P[0]) + jnp.sum(W[0]) + jnp.sum(tau)
                s = jax.lax.fori_loop(0, nblk, pan, jnp.float32(0))
                return xx + s * 1e-38
            y = jax.lax.fori_loop(0, k, rep, x)
            return jnp.sum(y[0])
        return jax.jit(f)

    f1, f2 = mk(1), mk(3)
    float(f1(aj)); float(f2(aj))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(aj))
        t1 = time.perf_counter(); float(f2(aj))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 2)
    print(f"panels-only M={M} nb={nb} ts={ts}: {best*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    if not ON_TPU:
        check_panel(512, 32, 128, 0, 32, interpret=True)
        check_panel(512, 32, 128, 64, 32, interpret=True)   # mid panel
        check_panel(512, 32, 128, 448, 16, interpret=True)  # short last
        check_panel(512, 128, 128, 128, 128, interpret=True)
        print("interpreter OK", flush=True)
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep":
        # ADVICE r3: sweep every gate candidate (or take ts from argv)
        ts_list = tuple(int(t) for t in sys.argv[2:]) or (512, 1024, 2048)
        for ts in ts_list:
            time_panels(8192, 128, ts)
        time_tridiag(8192, 128)   # full driver at the retuned gate ts
    elif FORCE_XLA:
        # same-session A/B: disable the Pallas gate, time the XLA panel
        import elementalx.kernels.common as KC
        KC.on_tpu = lambda: False
        time_tridiag(8192, 128)
    else:
        check_panel(2048, 128, 512, 0, 128, interpret=False)
        check_panel(2048, 128, 512, 512, 128, interpret=False)
        check_full(2048, 128)
        time_tridiag(8192, 128)
