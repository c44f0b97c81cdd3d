"""Symmetric tridiagonal eigensolver: Sturm bisection + batched inverse
iteration.

Reference: src/lapack_like/spectral/HermitianTridiagEig.cpp, which
delegates to the vendored pmrrr (external/pmrrr, C + MPI + pthreads,
15.8k LoC: plarre.c eigenvalues / plarrv.c eigenvectors, work split over
ranks and threads).

TPU-native replacement (SURVEY §2.6 plan): the eigenvalue work-queue
parallelism of pmrrr becomes *data* parallelism — all n eigenvalues are
bisected simultaneously (a vmapped Sturm-count scan; ~50 fixed
iterations), then all eigenvectors are computed simultaneously by
batched twisted-factorization inverse iteration (vmapped O(n) scans).
Clustered eigenvalues get a masked Gram-Schmidt pass per cluster window.
Everything is jittable with static shapes."""

from __future__ import annotations

import functools

from typing import Tuple

import jax
import jax.numpy as jnp

from ..kernels.common import on_tpu


def _unroll(k: int) -> int:
    """Scan/loop unroll factor: fusing many recurrence steps per loop
    body pays off on TPU (each step is ~us-dispatch-bound) but bloats
    the XLA:CPU compile — large unrolled eig programs were observed to
    SEGFAULT the CPU backend mid-suite, and CPU steps are cheap anyway."""
    return k if on_tpu() else 1


def _sturm_count(d: jax.Array, e: jax.Array, lam: jax.Array) -> jax.Array:
    """Number of eigenvalues of T strictly below lam, via the standard
    shifted-LDL^T recurrence (pmrrr's plarre core loop, vectorised over a
    batch of shifts lam: (k,))."""
    n = d.shape[0]
    eps = jnp.finfo(d.dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(d)),
                        jnp.max(jnp.abs(e)) if e.shape[0] else 0.0)
    # dlaneg convention: a vanishing pivot is replaced by a tiny NEGATIVE
    # value (and therefore counted) — an exact eigenvalue hit must not
    # flip the count
    floor = eps * eps * jnp.maximum(scale, 1.0)
    e2 = jnp.concatenate([jnp.zeros((1,), d.dtype), e * e])

    def body(carry, x):
        q, cnt = carry
        di, e2i = x
        q = (di - lam) - e2i / q
        q = jnp.where(jnp.abs(q) < floor, -floor, q)
        cnt = cnt + (q < 0)
        return (q, cnt), None

    q0 = jnp.ones_like(lam)
    cnt0 = jnp.zeros(lam.shape, jnp.int32)
    # unroll: each scan step is a handful of cheap vector ops whose
    # ~us-level dispatch latency dominates an n-step sequential scan on
    # TPU; fusing 64 recurrence steps per compiled loop body cuts the
    # bisection stage ~an order of magnitude (PERF.md)
    (q, cnt), _ = jax.lax.scan(body, (q0, cnt0), (d, e2), unroll=_unroll(64))
    return cnt


def _gershgorin(d: jax.Array, e: jax.Array) -> Tuple[jax.Array, jax.Array]:
    n = d.shape[0]
    ea = jnp.concatenate([jnp.zeros((1,), d.dtype), jnp.abs(e)])
    eb = jnp.concatenate([jnp.abs(e), jnp.zeros((1,), d.dtype)])
    r = ea + eb
    return jnp.min(d - r), jnp.max(d + r)


_SECT = 8  # interval subdivisions per iteration (3 bits/step)


@functools.partial(jax.jit, static_argnames=('iters',))
def tridiag_eigvalsh(d: jax.Array, e: jax.Array, iters: int = 0
                     ) -> jax.Array:
    """All eigenvalues of the symmetric tridiagonal (d, e), ascending, by
    vmapped multisection on the Sturm count.

    Octsection instead of bisection: each iteration probes the 7
    interior points of every eigenvalue's bracket with ONE batched
    Sturm scan over 7n shifts (the scan cost is per-STEP dispatch
    latency, near-independent of the batch width on the VPU), gaining
    3 bits per iteration — 14 iterations reach f32 Gershgorin-relative
    accuracy where plain bisection needed 40 (259 ms -> ~100 ms at
    n=8192, PERF.md)."""
    n = d.shape[0]
    S = _SECT
    lo, hi = _gershgorin(d, e)
    span = jnp.maximum(hi - lo, jnp.finfo(d.dtype).tiny)
    lo = lo - 1e-3 * span - 1e-30
    hi = hi + 1e-3 * span + 1e-30
    # bits needed: interval shrinks S^its; match the old 40/70 bisection
    # bits plus one extra iteration of margin
    bits = 70 if d.dtype == jnp.float64 else 40
    its = iters or (-(-bits // 3) + 1)
    ks = jnp.arange(n, dtype=jnp.int32)
    los = jnp.full((n,), lo)
    his = jnp.full((n,), hi)
    fr = (jnp.arange(1, S, dtype=d.dtype) / S)[:, None]  # (S-1, 1)

    def body(_, carry):
        los, his = carry
        pts = los[None, :] + fr * (his - los)[None, :]     # (S-1, n)
        cnt = _sturm_count(d, e, pts.reshape(-1)).reshape(S - 1, n)
        above = cnt <= ks[None, :]  # eigenvalue k lies above this point
        # tightest bracket: highest probe below, lowest probe above
        los = jnp.max(jnp.where(above, pts, los[None, :]), axis=0)
        his = jnp.min(jnp.where(above, his[None, :], pts), axis=0)
        return los, his

    los, his = jax.lax.fori_loop(0, its, body, (los, his))
    return 0.5 * (los + his)


def _solve_shifted(d: jax.Array, e: jax.Array, lam: jax.Array,
                   b: jax.Array) -> jax.Array:
    """Solve (T - lam I) x = b by LU without pivoting on the tridiagonal
    (two scans; perturbation keeps it nonsingular). Used for inverse
    iteration — pivot growth only amplifies the wanted eigenvector."""
    n = d.shape[0]
    eps = jnp.finfo(d.dtype).eps
    dd = d - lam

    # forward elimination: l_i = e_i / u_i ; u_{i+1} = dd_{i+1} - l_i e_i
    def fwd(carry, x):
        u_prev = carry
        ddi, ei_prev = x  # e entering row i (e_{i-1})
        safe = jnp.where(jnp.abs(u_prev) < eps, eps, u_prev)
        li = ei_prev / safe
        ui = ddi - li * ei_prev
        return ui, (ui, li)

    e_in = jnp.concatenate([jnp.zeros((1,), d.dtype), e])
    _, (u, l) = jax.lax.scan(fwd, jnp.ones((), d.dtype), (dd, e_in),
                             unroll=_unroll(64))
    # but the very first u must be dd[0]:
    u = u.at[0].set(dd[0])

    # forward substitution L y = b
    def fsub(y_prev, x):
        bi, li = x
        yi = bi - li * y_prev
        return yi, yi

    _, y = jax.lax.scan(fsub, jnp.zeros((), b.dtype), (b, l), unroll=_unroll(64))

    # back substitution U x = y (u x_i + e_i x_{i+1} = y_i)
    e_out = jnp.concatenate([e, jnp.zeros((1,), d.dtype)])

    def bsub(x_next, t):
        yi, ui, ei = t
        safe = jnp.where(jnp.abs(ui) < eps, eps, ui)
        xi = (yi - ei * x_next) / safe
        return xi, xi

    _, xr = jax.lax.scan(bsub, jnp.zeros((), b.dtype),
                         (y[::-1], u[::-1], e_out[::-1]), unroll=_unroll(64))
    return xr[::-1]


@functools.partial(jax.jit, static_argnames=('invit_steps', 'ortho_window', 'ortho_passes'))
def tridiag_eig(d: jax.Array, e: jax.Array, invit_steps: int = 1,
                ortho_window: int = 8, ortho_passes: int = 2
                ) -> Tuple[jax.Array, jax.Array]:
    """(w, Z): full eigendecomposition of the symmetric tridiagonal.

    Eigenvectors by vmapped inverse iteration from the bisection values,
    with close-eigenvalue separation perturbation, cluster-masked
    CholeskyQR orthonormalization BETWEEN the iteration rounds (block
    inverse subspace iteration — the role pmrrr's representation trees
    play; without it a wide cluster's block rank-collapses onto the few
    directions nearest the shifts), and windowed Gram-Schmidt sweeps for
    mildly close pairs. ``invit_steps`` is the solve count per round —
    it must stay 1 so every re-amplification starts from a full-rank
    orthonormal cluster basis."""
    n = d.shape[0]
    w = tridiag_eigvalsh(d, e)
    eps = jnp.finfo(d.dtype).eps
    tnorm = jnp.maximum(jnp.max(jnp.abs(d)), jnp.max(jnp.abs(e)) if
                        e.shape[0] else 0.0)
    # ---- SPLITTING (LAPACK dstebz/pmrrr dlarra): zero negligible
    # couplings BEFORE the eigenvector phase. A glued-Wilkinson chain
    # (e_glue ~ 1e-14) couples its blocks just enough that the no-pivot
    # shifted solves develop wildly varying gains (measured 1e15..1e39 at
    # n=4116): columns sharing a dominant direction rank-collapse the
    # cluster block beyond what f64 CholeskyQR can recover (components
    # below eps are invisible to the Gram). Zeroing |e_i| <= K*eps*
    # sqrt(|d_i d_{i+1}|) decouples the blocks exactly: solve gains
    # equalize, cross-block vectors get disjoint supports (orthogonality
    # is automatic), and the residual cost is bounded by the largest
    # zeroed entry — K*eps*||T||, i.e. O(K/n) in scaled units. The
    # relative criterion keeps graded matrices safe (a tiny coupling
    # between tiny diagonals is NOT negligible). Eigenvalues still come
    # from the unsplit matrix above.
    if e.shape[0]:
        dg = jnp.sqrt(jnp.abs(d[:-1]) * jnp.abs(d[1:]))
        stol = 64 * eps * jnp.maximum(dg, eps * jnp.maximum(tnorm, 1.0))
        e = jnp.where(jnp.abs(e) <= stol, jnp.zeros((), e.dtype), e)
    # split exact-duplicate targets with a BOUNDED local jitter (a few
    # ulp of ||T||; an unbounded idx-proportional offset would swamp the
    # eigenvalue accuracy in low precision)
    gap_tol = eps * jnp.maximum(tnorm, 1.0)
    idx = jnp.arange(n)
    jitter = ((idx % 8).astype(w.dtype) - 3.5) * gap_tol
    shifts = w + jitter

    key = jax.random.key(7)
    b0 = jax.random.normal(key, (n, n), d.dtype)  # row i: rhs for eig i

    def one_vec(lam, b):
        def it(_, x):
            x = _solve_shifted(d, e, lam, x)
            nx = jnp.sqrt(jnp.sum(x * x))
            return x / jnp.where(nx == 0, 1, nx)

        return jax.lax.fori_loop(0, invit_steps, it, b)

    Z = jax.vmap(one_vec)(shifts, b0)  # (n, n): row i = eigvec i

    def rayleigh(Z):
        # Rayleigh quotients of the row-vectors of Z
        Td = (d[None, :] * Z
              + jnp.concatenate([jnp.zeros((n, 1), Z.dtype),
                                 e[None, :] * Z[:, :-1]], axis=1)
              + jnp.concatenate([e[None, :] * Z[:, 1:],
                                 jnp.zeros((n, 1), Z.dtype)], axis=1))
        return jnp.sum(Z * Td, axis=1)

    # ---- cluster machinery (the role pmrrr's representation tree
    # plays, external/pmrrr/src/plarrv.c). Sturm bisection cannot
    # resolve eigenvalues spaced below ~eps*||T|| (glued-Wilkinson
    # blocks put HUNDREDS within a few ulp), so per-column shifts
    # inside a cluster all concentrate inverse iteration onto the few
    # directions nearest them and the block rank-collapses. The fix is
    # the classical block one: orthogonalize the cluster block BETWEEN
    # inverse-iteration rounds (block inverse subspace iteration), so
    # each round re-amplifies a full-rank basis of the subspace.
    # Clusters are CONTIGUOUS in the ascending bisection order, so the
    # cluster-masked Gram is block-diagonal (hence PSD) and one masked
    # CholeskyQR orthonormalizes all clusters at once with three MXU
    # matmuls. Any orthonormal basis of a cluster subspace is a valid
    # eigenbasis to residual ~ cluster width (<= ctol = alpha*n*eps*|T|).
    # ctol: pairs with eigenvalue gap g have invit overlap ~C*eps|T|/g
    # (C ~ 30 measured on glued Wilkinson at n=4116), so the 32*n*eps
    # orthogonality bar needs EXPLICIT orthogonalization of every pair
    # with g <~ 4|T|/n. Including a pair in one QR block costs residual
    # ~overlap*g ~ eps|T| REGARDLESS of g (the mixing coefficient
    # shrinks as the gap grows), so a wide ctol is safe.
    hiprec = jax.lax.Precision.HIGHEST
    ctol = jnp.maximum(16 * n * eps, 4.0 / n) * jnp.maximum(tnorm, 1.0)
    newc = jnp.concatenate([jnp.ones((1,), bool), jnp.diff(w) > ctol])
    cid = jnp.cumsum(newc.astype(jnp.int32))
    Mcl = cid[:, None] == cid[None, :]
    from ..blas.trinv import tri_inv_lower

    def cluster_qr(Z, reg):
        """Masked CholeskyQR: exact orthonormalization inside every
        (contiguous) cluster block; identity across blocks."""
        G = jnp.matmul(Z.T, Z, precision=hiprec)
        Gm = jnp.where(Mcl, G, jnp.zeros((), Z.dtype)) + reg * jnp.eye(
            n, dtype=Z.dtype)
        Lc = jnp.linalg.cholesky(Gm)
        # guard a failed factorization (pathological rank deficiency):
        # skip the orthonormalization entirely rather than poisoning Z
        # with an elementwise NaN patch
        ok = jnp.all(jnp.isfinite(Lc))
        Lc = jnp.where(ok, Lc, jnp.eye(n, dtype=Z.dtype))
        return jnp.matmul(Z, tri_inv_lower(Lc).T, precision=hiprec)

    Z = cluster_qr(Z.T, jnp.asarray(16 * n * eps, d.dtype)).T

    # second round from Rayleigh-refined shifts: in low precision the
    # bisection values carry O(eps*||T||) error that inverse iteration
    # would otherwise leak into neighbouring eigenvectors
    w_r = rayleigh(Z)
    shifts2 = w_r + jitter
    Z = jax.vmap(one_vec)(shifts2, Z)
    Z = Z.T  # columns are eigenvectors
    Z = cluster_qr(Z, jnp.asarray(16 * n * eps, d.dtype))
    Z = cluster_qr(Z, jnp.zeros((), d.dtype))

    # windowed modified Gram-Schmidt passes to orthogonalise clusters:
    # vectors whose eigenvalues are within the window are near-parallel
    # risks; subtract projections onto the previous `ortho_window`
    # columns. Only the window is touched per step (O(n * w), not the
    # O(n^2) full-width matvec that would dominate the whole eigensolve).
    wwin = min(ortho_window, max(n - 1, 1))

    def mgs_pass(Z):
        def col(j, Z):
            zj = jax.lax.dynamic_index_in_dim(Z, j, axis=1, keepdims=False)
            start = jnp.clip(j - wwin, 0, max(n - wwin, 0))
            W = jax.lax.dynamic_slice(Z, (0, start), (n, wwin))
            cols = start + jnp.arange(wwin)
            close = jnp.abs(w[cols] - w[j]) < 1e3 * jnp.sqrt(eps) * \
                jnp.maximum(tnorm, 1)
            use = (cols < j) & close
            coeffs = jnp.where(use, W.T @ zj, jnp.zeros((wwin,), Z.dtype))
            zj = zj - W @ coeffs
            nz = jnp.sqrt(jnp.sum(zj * zj))
            zj = zj / jnp.where(nz == 0, 1, nz)
            return jax.lax.dynamic_update_index_in_dim(
                Z, zj[:, None], j, axis=1)

        # unroll: ~8 small window ops per column; fusing columns
        # amortizes per-step dispatch latency (the window recurrence
        # stays sequential — unroll preserves loop semantics)
        return jax.lax.fori_loop(0, n, col, Z, unroll=_unroll(8))

    for _ in range(ortho_passes):
        Z = mgs_pass(Z)

    # final Rayleigh-quotient refinement of eigenvalues, clamped to the
    # bisection bracket (Rayleigh from a mixed/defective vector must
    # never drag an eigenvalue away from its Sturm-certified location)
    Td = (d[:, None] * Z + jnp.concatenate(
        [jnp.zeros((1, n), Z.dtype), e[:, None] * Z[:-1]]) + jnp.concatenate(
        [e[:, None] * Z[1:], jnp.zeros((1, n), Z.dtype)]))
    w_ref = jnp.sum(Z * Td, axis=0)
    clamp = 256 * eps * jnp.maximum(tnorm, 1.0)
    w_ref = jnp.clip(w_ref, w - clamp, w + clamp)
    order = jnp.argsort(w_ref)
    return w_ref[order], Z[:, order]


def HermitianTridiagEig(d: jax.Array, e: jax.Array, vectors: bool = True,
                        backend: str = "jax"):
    """El-style driver (reference: HermitianTridiagEig.cpp). backend
    'native' uses the C++ host solver (native/elx_tridiag.cpp, the pmrrr
    replacement) — eager-only; 'jax' is the batched on-device solver."""
    if backend == "dc_device":
        from .tridiag_dc_device import tridiag_eig_dc_device

        w, Z = tridiag_eig_dc_device(d, e)
        return (w, Z) if vectors else w
    if backend == "dc":
        from .tridiag_dc import HermitianTridiagEigDC

        import numpy as _np

        w, Z = HermitianTridiagEigDC(_np.asarray(d), _np.asarray(e))
        return (w, Z) if vectors else w
    if backend == "native":
        import numpy as _np

        from ..native import tridiag_eig_native

        w, Z = tridiag_eig_native(_np.asarray(d), _np.asarray(e),
                                  want_vectors=vectors)
        if vectors:
            return jnp.asarray(w), jnp.asarray(Z)
        return jnp.asarray(w)
    if vectors:
        return tridiag_eig(d, e)
    return tridiag_eigvalsh(d, e)
