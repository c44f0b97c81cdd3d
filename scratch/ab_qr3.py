"""A/B: CholeskyQR2 + Householder-reconstruction QR panels (TSQR-HR).

The measured QR ceiling at 16384 f32 is 208.8 ms = ~92 ms of invariant
compact-WY apply flops + ~117 ms of geqrf panel cost (the custom call
runs at ~1.2 TF/s effective and scales with panel AREA — PERF.md).
Replace the panel with an MXU-bound scheme:

  1. G = A1^T A1 (HIGHEST) ; R1 = chol(G + shift) ; Q1 = A1 R1^{-1}
  2. G2 = Q1^T Q1 (HIGHEST) ; R2 = chol(G2) (CholeskyQR2) ; R = R2 R1
  3. Householder reconstruction (Ballard et al., IPDPS'14): with sign
     column scaling S (s_i = -sign(q_ii)), LU-factor  Q S - E1 = V W
     (V unit-lower-trapezoidal M x b, W upper b x b). Then
     I - V T V^H (T = -W V1^{-H}) is the orthogonal factor with
     (I - V T V^H) E1 = Q S, tau_i = -W_ii, and the packed panel is
     V below the diagonal, R~ = S R above. V2 never needs the explicit
     tall Q: V2 = Q1[b:] @ (R2^{-1} S W^{-1}) — one fused tall matmul.
  4. Runtime predicate (max|Q1^T Q1 - I| < 0.25 after pass 1, identity
     LU pivots, finite) routes hard panels to a geqrf fallback inside a
     lax.cond whose carry is ONLY the (Mt, b) packed slab (round 1 of
     this A/B carried the full N^2 matrix through the cond: 382 ms).
     Panels with aspect Mt/b < 4 go straight to geqrf (square-ish
     trailing corners are exactly where cond(panel) blows up the
     predicate, and their geqrf area is small).

Run from repo root: python -u scratch/ab_qr3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas.gemm import hot_precision, local_gemm
from elementalx.blas.trinv import tri_inv_upper
from elementalx.lapack.qr import _panel_qr
from elementalx.lapack.reflect import apply_block_reflector, build_wy_T

HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def _geqrf_packed(s32, nb):
    """geqrf of the (Mt, nb) slice -> (packed slab, tau, T)."""
    from jax._src.lax.linalg import geqrf
    pk, tnew = geqrf(s32)
    r2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 1)
    V = jnp.where(r2 > c2, pk, jnp.zeros_like(pk))
    V = jnp.where(r2 == c2, jnp.ones((), pk.dtype), V)
    return pk, tnew, build_wy_T(V, tnew)


def _panel_cholqr(a, tau, k0, nb, m):
    """CholeskyQR2 + Householder reconstruction of columns [k0, k0+nb)."""
    M, N = a.shape
    Mt = M - k0
    sl = jax.lax.dynamic_slice(a, (k0, k0), (Mt, nb))
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    s32 = sl.astype(jnp.float32) if low else sl

    if Mt < 4 * nb:
        pk, tnew, T = _geqrf_packed(s32, nb)
    else:
        eps = jnp.finfo(jnp.float32).eps
        eye = jnp.eye(nb, dtype=jnp.float32)
        G1 = local_gemm(s32.T, s32, precision=HI)
        shift = (100.0 * nb * eps) * jnp.max(jnp.abs(jnp.diag(G1)))
        R1 = jax.lax.linalg.cholesky(G1 + shift * eye).T
        Q1 = local_gemm(s32, tri_inv_upper(R1), precision=H3)
        G2 = local_gemm(Q1.T, Q1, precision=HI)
        ortho_err = jnp.max(jnp.abs(G2 - eye))
        R2 = jax.lax.linalg.cholesky(G2).T
        R2inv = tri_inv_upper(R2)
        R = jnp.triu(local_gemm(R2, R1))
        # top b rows of Q (small), signs, reconstruction LU
        Q_top = local_gemm(Q1[:nb, :], R2inv)
        qd = jnp.diag(Q_top)
        s = jnp.where(qd >= 0, -jnp.ones_like(qd), jnp.ones_like(qd))
        B1 = Q_top * s[None, :] - eye
        lu1, _, perm = jax.lax.linalg.lu(B1)
        ident = jnp.all(perm == jnp.arange(nb, dtype=perm.dtype))
        r2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        W = jnp.where(r2 <= c2, lu1, jnp.zeros_like(lu1))
        V1 = jnp.where(r2 > c2, lu1, jnp.zeros_like(lu1))
        tau_new = -jnp.diag(W)
        # V2 = Q[b:] S W^{-1} = Q1[b:] @ (R2^{-1} S W^{-1}) (one matmul)
        C = local_gemm(R2inv * s[None, :], tri_inv_upper(W))
        V2 = local_gemm(Q1[nb:, :], C, precision=H3)
        Rt = s[:, None] * R
        ok = (ortho_err < 0.25) & ident & jnp.all(jnp.isfinite(Rt)) \
            & jnp.all(jnp.isfinite(V2)) \
            & jnp.all(jnp.abs(tau_new) > 0.5)
        # packed slab: strict-lower V, R~ on/above the diagonal
        top = jnp.where(r2 > c2, V1, Rt)
        packed_fast = jnp.concatenate([top, V2], axis=0)
        tau_fast = tau_new
        # T comes free from the reconstruction: T = -W V1^{-H}
        # (the outer loop's build_wy_T Gram over the tall V is a 6-pass
        # HIGHEST matmul per panel — skip it entirely)
        V1u = jnp.where(r2 == c2, jnp.ones((), s32.dtype), V1)
        from elementalx.blas.trinv import tri_inv_lower_unit
        T_fast = -local_gemm(W, jnp.conj(tri_inv_lower_unit(V1u)).T)

        def fast(s32):
            return packed_fast, tau_fast, T_fast

        def slow(s32):
            return _geqrf_packed(s32, nb)

        pk, tnew, T = jax.lax.cond(ok, fast, slow, s32)

    if low:
        pk = pk.astype(a.dtype)
        tnew = tnew.astype(a.dtype)
        T = T.astype(a.dtype)
    a = jax.lax.dynamic_update_slice(a, pk, (k0, k0))
    tau = jax.lax.dynamic_update_slice(tau, tnew.astype(tau.dtype), (k0,))
    return a, tau, T


def qr_cholqr(a, m, n, nb):
    M, N = a.shape
    ncols = min(m, n)
    tau = jnp.zeros((N,), a.dtype)
    hp = hot_precision(a.dtype)
    k0 = 0
    while k0 < ncols:
        w = min(nb, ncols - k0)
        a, tau, T = _panel_cholqr(a, tau, k0, w, m)
        if k0 + w < N:
            sl = a[k0:, k0:k0 + w]
            r2 = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 0)
            c2 = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
            V = jnp.where(r2 > c2, sl, jnp.zeros_like(sl))
            V = jnp.where(r2 == c2, jnp.ones((), a.dtype), V)
            Asub = a[k0:, k0 + w:]
            upd = apply_block_reflector(V, T, Asub, adjoint=True,
                                        precision=hp)
            a = jax.lax.dynamic_update_slice(a, upd, (k0, k0 + w))
        k0 += w
    return a, tau


def chain_time(make_chain, args, k1=1, k2=3, reps=3):
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


def check_correctness(grid):
    from elementalx.lapack.reflect import ApplyPackedReflectors
    rng = np.random.default_rng(1)
    for tag, mk in [
        ("gauss 768", lambda: rng.standard_normal((768, 768))),
        ("tall 2048x320", lambda: rng.standard_normal((2048, 320))),
        ("graded 1536", lambda: rng.standard_normal((1536, 1536))
         * np.logspace(0, -7, 1536)[None, :]),
    ]:
        a0 = mk().astype(np.float32)
        mm, nn = a0.shape
        out, tau = jax.jit(
            lambda x: qr_cholqr(x, mm, nn, 256))(jnp.asarray(a0))
        k = min(mm, nn)
        R = np.triu(np.asarray(out))[:k, :]
        eye = jnp.eye(mm, dtype=jnp.float32)
        Qfull = ApplyPackedReflectors(out, tau, eye, 256, k, adjoint=False)
        Q = np.asarray(Qfull)[:, :k]
        resid = np.linalg.norm(Q @ R - a0) / np.linalg.norm(a0)
        orth = np.linalg.norm(Q.T @ Q - np.eye(k))
        print(f"  {tag}: resid {resid:.2e}  orth {orth:.2e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    if os.environ.get("CHECK", "1") != "0":
        check_correctness(grid)
    if os.environ.get("TIME", "1") == "0":
        return
    N = int(os.environ.get("N", 16384))
    dt = jnp.bfloat16 if os.environ.get("BF16") else jnp.float32
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = jnp.asarray(a, dt)

    if os.environ.get("V0"):
        def mk_cur(k):
            def f(x):
                def body(_, X):
                    F = El.QR(DistMatrix.from_global(X, grid=grid))
                    s = jnp.sum(F.packed.data.astype(jnp.float32)) * 1e-30
                    return X.at[0, 0].add(s.astype(X.dtype))
                X = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(X[0].astype(jnp.float32))
            return jax.jit(f)
        t = chain_time(mk_cur, (A,))
        print(f"V0 geqrf-panel: {t*1e3:.1f} ms  "
              f"{(4/3)*N**3/t/1e12:.1f} TF/s", flush=True)

    for nb in [int(x) for x in os.environ.get("NBS", "256,512").split(",")]:
        def mk(k, nb=nb):
            def f(x):
                def body(_, X):
                    out, tau = qr_cholqr(X, N, N, nb)
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return X.at[0, 0].add(s.astype(X.dtype))
                X = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(X[0].astype(jnp.float32))
            return jax.jit(f)
        t = chain_time(mk, (A,))
        print(f"cholqr nb={nb}: {t*1e3:.1f} ms  "
              f"{(4/3)*N**3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
