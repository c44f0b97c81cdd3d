"""Schur decomposition and general eigensolvers.

Reference: src/lapack_like/spectral/HessenbergSchur/ (sequential QR
algorithm with aggressive early deflation — the reference deliberately
keeps this host-sequential, ElementalREADME.md:43), spectral/Schur/SDC.hpp
(distributed sign-based spectral divide-and-conquer prototype),
QuasiTriangEig / TriangEig (triangular eigenvectors via multi-shift
solves), Eig driver.

TPU-native split of labor:
 * Hessenberg reduction: on-device blocked reflectors (condense.py).
 * The QR iteration itself: implicit single-shift complex QR with
   Wilkinson shifts and deflation, host-side numpy — the same
   "sequential bulge chase stays on the host" decision the reference
   makes; O(n^2) data, O(n^3) scalar-ish work that no SIMD unit helps.
 * SDC: sign-function spectral splitting (funcs.Sign, all MXU work)
   with rank-revealing subspace extraction, recursing on the diagonal
   blocks — the scalable path for well-separated spectra.
 * TriangEig: batched shifted triangular solves (vmapped, MXU).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import ADJOINT, LOWER, MC, MR, NORMAL, UPPER
from ..blas.gemm import Gemm
from .condense import Hessenberg, hessenberg_apply_q


# measured knee (n=1000 host sweep): the serial native window solver
# beats AED+multibulge rounds only below ~256 now that the chase inner
# loop is native (3.66 s at 256 vs 5.82 at 384 / 5.47 at 64)
_NATIVE_QR_CUTOFF = 256


def _wilkinson_shift(T: np.ndarray, m: int) -> complex:
    a, b = T[m - 2, m - 2], T[m - 2, m - 1]
    c, d = T[m - 1, m - 2], T[m - 1, m - 1]
    tr = a + d
    det = a * d - b * c
    disc = np.sqrt(tr * tr - 4 * det)
    r1 = (tr + disc) / 2
    r2 = (tr - disc) / 2
    return r1 if abs(r1 - d) < abs(r2 - d) else r2


def _single_sweep(T, Z, l, m, mu, want_vecs) -> None:
    """One implicit single-shift QR sweep on window [l, m) (Givens bulge
    chase), updating T (and Z) in place. Each rotation is applied as one
    2xlen / lenx2 matmul (one BLAS call per side instead of a dozen
    small slice ops — the sweep is pure Python overhead otherwise)."""
    x = T[l, l] - mu
    y = T[l + 1, l]
    G = np.empty((2, 2), T.dtype)
    for k in range(l, m - 1):
        ax, ay = abs(x), abs(y)
        r = np.hypot(ax, ay)
        if r == 0.0:
            cs, sn = 1.0, 0.0 + 0.0j
        else:
            cs = ax / r
            phase = x / ax if ax > 0 else 1.0
            sn = phase * np.conj(y) / r
        G[0, 0] = cs
        G[0, 1] = sn
        G[1, 0] = -np.conj(sn)
        G[1, 1] = cs
        c0 = k - 1 if k > l else l
        T[k:k + 2, c0:] = G @ T[k:k + 2, c0:]
        hi = min(k + 3, m)
        T[:hi, k:k + 2] = T[:hi, k:k + 2] @ G.conj().T
        if want_vecs:
            Z[:, k:k + 2] = Z[:, k:k + 2] @ G.conj().T
        if k < m - 2:
            x = T[k + 1, k]
            y = T[k + 2, k]


def _host_householder(x: np.ndarray):
    """Hermitian reflector H = I - tau v v^H with H x = beta e1
    (complex-sign convention; tau real)."""
    nrm = np.linalg.norm(x)
    if nrm == 0.0:
        return np.zeros_like(x), 0.0, 0.0
    a0 = x[0]
    sign = a0 / abs(a0) if abs(a0) > 0 else 1.0
    beta = -sign * nrm
    v = x.copy()
    v[0] -= beta
    vn2 = np.real(v @ np.conj(v))
    if vn2 == 0.0:
        return np.zeros_like(x), 0.0, beta
    tau = 2.0 / vn2
    return v, tau, beta


def _rehessenberg(T, Z, k0, k1, want_vecs) -> None:
    """Reduce T[k0:k1, k0:k1] back to upper Hessenberg by Householder
    similarities applied across the full matrix, in place."""
    for j in range(k0, k1 - 2):
        x = T[j + 1:k1, j].copy()
        v, tau, beta = _host_householder(x)
        if tau == 0.0:
            continue
        # left: rows j+1..k1
        W = np.conj(v) @ T[j + 1:k1, :]
        T[j + 1:k1, :] -= tau * np.outer(v, W)
        # right: cols j+1..k1
        W = T[:, j + 1:k1] @ v
        T[:, j + 1:k1] -= tau * np.outer(W, np.conj(v))
        if want_vecs:
            W = Z[:, j + 1:k1] @ v
            Z[:, j + 1:k1] -= tau * np.outer(W, np.conj(v))
        T[j + 2:k1, j] = 0.0  # beta landed at T[j+1, j]; clean the dust


def _reflector3(v: np.ndarray):
    """Unnormalised 3(or 2)-vector -> (v_house, tau) with
    (I - tau v v^H) x ∝ e1 (complex Householder, tau real)."""
    nrm = np.linalg.norm(v)
    if nrm == 0.0:
        return np.zeros_like(v), 0.0
    a0 = v[0]
    sign = a0 / abs(a0) if abs(a0) > 0 else 1.0
    beta = -sign * nrm
    vh = v.copy()
    vh[0] -= beta
    vn2 = np.real(vh @ np.conj(vh))
    if vn2 == 0.0:
        return np.zeros_like(v), 0.0
    return vh, 2.0 / vn2


def _multibulge_sweep(T, Z, l, m, shifts, want_vecs, accum_extra=32) -> None:
    """Small-bulge multishift QR sweep with accumulated (level-3) updates
    on window [l, m) (reference: spectral/HessenbergSchur's multibulge
    tree; Braman-Byers-Mathias part I / LAPACK zlaqr5 structure).

    The shifts are paired into 3x3 two-shift bulges spaced 3 rows apart;
    the packet marches down the Hessenberg band inside a sliding
    accumulation window, and the window-local unitary U is applied to the
    off-window row/column strips (and Z) as matrix products — converting
    ~80% of the sweep's flops from scalar Givens traffic into GEMMs."""
    win = m - l
    ns = (len(shifts) // 2) * 2
    if ns == 0:
        return
    if win < 12 or ns < 4:
        for mu in shifts[: max(ns, 1)]:
            _single_sweep(T, Z, l, m, mu, want_vecs)
        return
    nb = min(ns // 2, max(1, (win - 3) // 3))
    shifts = np.asarray(shifts[: 2 * nb])
    n = T.shape[0]
    # chase-step counter: bulge j is introduced at step 3*j (leading
    # column l); at packet position p = t - 3*j >= 1 its chase reflector
    # annihilates column l + p - 1, after which its leading column is
    # l + p. The last useful chase is at column m - 3 (p = m - 2 - l).
    total = (m - 2 - l) + 3 * (nb - 1) + 1
    t = 0
    while t < total:
        # accumulation window [k1, k2): covers every row any bulge can
        # touch during the next `span` chase steps
        top_pos = min(l + max(t - 3 * (nb - 1), 0), m - 2)
        span = min(accum_extra + 3 * nb, total - t)
        k1 = max(top_pos - 1, l)
        # deepest element touched in the pass: the right application at
        # the last chase position k_last = l + (t+span-1) reaches row
        # k_last + 4 (the entry that becomes the next bulge)
        k2 = min(l + (t + span - 1) + 5, m)
        w = k2 - k1
        # the whole pass is confined to window [k1, k2) x [k1, k2): run
        # its `span` scalar chase steps in the native kernel
        # (native/elx_chase.cpp) when available — the numpy batched
        # chase below pays ~10 interpreter-dispatched fancy-indexed ops
        # per step, which dominated the 11.3 s Schur(1000) profile
        if T.dtype == np.complex128:
            try:
                from ..native import complex_chase_native

                Tw = np.ascontiguousarray(T[k1:k2, k1:k2])
                U = complex_chase_native(
                    Tw, np.ascontiguousarray(shifts, np.complex128),
                    nb, t, span, l, m, k1, k2)
                T[k1:k2, k1:k2] = Tw
                if k2 < n:
                    T[k1:k2, k2:] = np.conj(U.T) @ T[k1:k2, k2:]
                if k1 > 0:
                    T[:k1, k1:k2] = T[:k1, k1:k2] @ U
                if want_vecs:
                    Z[:, k1:k2] = Z[:, k1:k2] @ U
                t += span
                continue
            except RuntimeError:
                pass
        U = np.eye(w, dtype=T.dtype)

        def _apply_one(vh, tau, rows, c0):
            """Sequential similarity for edge cases (introduction and the
            shrunken 2-row exit reflector)."""
            if tau == 0.0:
                return
            Wl = np.conj(vh) @ T[rows, c0:k2]
            T[rows, c0:k2] -= tau * np.outer(vh, Wl)
            rend = min(rows.stop + 1, k2)
            Wr = T[k1:rend, rows] @ vh
            T[k1:rend, rows] -= tau * np.outer(Wr, np.conj(vh))
            ur = slice(rows.start - k1, rows.stop - k1)
            Wu = U[:, ur] @ vh
            U[:, ur] -= tau * np.outer(Wu, np.conj(vh))

        for step in range(t, t + span):
            # The bulges' reflector supports (rows k+1..k+3 per chase
            # column k, spaced >= 3 apart) are pairwise disjoint, so the
            # per-step reflectors commute and are applied BATCHED: one
            # gather + einsum + scatter for all bulges' left updates,
            # one for the rights, one for U — O(nb) Python overhead per
            # step becomes O(1) (the zlaqr5 bulk-chase idea).
            # strict bottom-first order: the 2-row exit reflector
            # (deepest) is applied before the batch, and the bulge
            # INTRODUCTION after it — the introduction's right update
            # writes the subdiagonal entry the next chase reads, and its
            # bulge tip lands in columns the full-width batched left
            # would otherwise smear
            ks = []
            intro = False
            for j in range(nb):
                p = step - 3 * j
                if p < 0 or p > m - 2 - l:
                    continue
                if p == 0:
                    intro = True
                    continue
                k = l + p - 1   # chase column
                if k >= m - 2:
                    continue
                if k == m - 3:  # exit reflector shrinks to 2 rows
                    v = T[k + 1:m, k].copy()
                    vh, tau = _reflector3(v)
                    _apply_one(vh, tau, slice(k + 1, m), k)
                    T[k + 2:m, k] = 0.0
                    continue
                ks.append(k)
            if ks:
                ka = np.asarray(ks)
                ridx = ka[:, None] + np.arange(1, 4)[None, :]  # (b, 3)
                V = T[ridx, ka[:, None]]                       # (b, 3)
                # vectorized Householder of each 3-vector
                nrm = np.sqrt(np.sum(np.abs(V) ** 2, axis=1))
                a0 = V[:, 0]
                aa = np.abs(a0)
                sign = np.where(aa > 0, a0 / np.where(aa == 0, 1, aa), 1.0)
                beta = -sign * nrm
                Vh = V.copy()
                Vh[:, 0] -= beta
                vn2 = np.sum(np.abs(Vh) ** 2, axis=1).real
                tau = np.where(vn2 > 0, 2.0 / np.where(vn2 == 0, 1, vn2),
                               0.0)
                # batched left: rows ridx (disjoint), cols [k1, k2)
                G = T[ridx, k1:k2]                             # (b, 3, w)
                Wl = np.einsum('bi,biw->bw', np.conj(Vh), G)
                G -= (tau[:, None] * Vh)[:, :, None] * Wl[:, None, :]
                T[ridx, k1:k2] = G
                # batched right: cols ridx (disjoint), rows [k1, k2)
                G = T[k1:k2, :][:, ridx]                       # (w, b, 3)
                Wr = np.einsum('wbi,bi->wb', G, Vh)
                G -= Wr[:, :, None] * (tau[:, None] * np.conj(Vh))[None]
                T[k1:k2, ridx.ravel()] = G.reshape(w, -1)
                # batched U accumulation (right-multiplication)
                G = U[:, ridx - k1]                            # (w, b, 3)
                Wu = np.einsum('wbi,bi->wb', G, Vh)
                G -= Wu[:, :, None] * (tau[:, None] * np.conj(Vh))[None]
                U[:, (ridx - k1).ravel()] = G.reshape(w, -1)
                # exact zeros below the subdiagonal of each chase column
                T[ridx[:, 1:], ka[:, None]] = 0.0
            if intro:
                # introduce the new bulge at the top of the window:
                # v = first 3 rows of (H - s1)(H - s2) e1
                j = step // 3
                s1, s2 = shifts[2 * j], shifts[2 * j + 1]
                h00, h01 = T[l, l], T[l, l + 1]
                h10, h11 = T[l + 1, l], T[l + 1, l + 1]
                v0 = (h00 - s1) * (h00 - s2) + h01 * h10
                v1 = h10 * (h00 + h11 - s1 - s2)
                if m - l >= 3:
                    v = np.array([v0, v1, h10 * T[l + 2, l + 1]],
                                 dtype=T.dtype)
                else:
                    v = np.array([v0, v1], dtype=T.dtype)
                vh, tau = _reflector3(v)
                _apply_one(vh, tau, slice(l, l + v.shape[0]), k1)
        # level-3 off-window updates
        if k2 < n:
            T[k1:k2, k2:] = np.conj(U.T) @ T[k1:k2, k2:]
        if k1 > 0:
            T[:k1, k1:k2] = T[:k1, k1:k2] @ U
        if want_vecs:
            Z[:, k1:k2] = Z[:, k1:k2] @ U
        t += span
    # clean sub-subdiagonal dust left by the bulge exits
    for k in range(l, m - 2):
        T[k + 2:min(k + 4, m), k] = 0.0


def _aed(T, Z, l, m, w, want_vecs, eps) -> Tuple[int, np.ndarray]:
    """Aggressive early deflation on the trailing w x w window of [l, m)
    (reference: spectral/HessenbergSchur's AED; Braman-Byers-Mathias).
    Returns (number of deflated eigenvalues, undeflatable window
    eigenvalues to use as shifts). Updates T, Z in place."""
    k0 = m - w
    Hw = T[k0:m, k0:m].copy()
    beta = T[k0, k0 - 1]
    try:
        from ..native import complex_aed_native

        # full window-local native AED (zlaqr3 role): window Schur +
        # reorder + spike elimination + re-Hessenberg accumulated into
        # W; apply W to the off-window strips here as GEMMs
        Tw, W, d, gamma, shifts = complex_aed_native(Hw, beta, eps)
        T[k0:m, k0:m] = Tw
        if k0 > 0:
            T[:k0, k0:m] = T[:k0, k0:m] @ W
        if m < T.shape[0]:
            T[k0:m, m:] = np.conj(W.T) @ T[k0:m, m:]
        if want_vecs:
            Z[:, k0:m] = Z[:, k0:m] @ W
        T[k0:m, k0 - 1] = 0.0
        T[k0, k0 - 1] = gamma
        return d, shifts
    except RuntimeError:
        pass
    # numpy fallback: the window eigensolve recurses with proportionally
    # smaller AED windows (bottoming out in plain sweeps below ~3*16) —
    # the window solves dominate the driver's cost otherwise
    Tw, Zw = _hessenberg_qr_host(Hw, True, use_aed=True,
                                 aed_window=max(8, w // 4))
    scale = max(np.max(np.abs(np.diag(Tw))), abs(beta), 1e-300)
    # Braman-Byers-Mathias reordering: test window eigenvalues bottom-up;
    # undeflatable ones are swapped to the top of the window so the
    # deflatable set accumulates contiguously at the bottom
    u = 0          # undeflatable count (occupy window positions [0, u))
    k = w - 1
    while k >= u:
        s_k = beta * np.conj(Zw[0, k])
        if abs(s_k) <= eps * max(abs(Tw[k, k]), scale):
            k -= 1                       # deflatable: leave at the bottom
        else:
            for j in range(k - 1, u - 1, -1):
                _swap_adjacent(Tw, Zw, j)  # bubble position k up to u
            u += 1                       # entry now at k is untested
    d = w - u
    spike = beta * np.conj(Zw[0, :])
    # apply the window similarity to the full matrix
    T[k0:m, k0:m] = Tw
    T[:k0, k0:m] = T[:k0, k0:m] @ Zw
    if m < T.shape[0]:
        T[k0:m, m:] = np.conj(Zw.T) @ T[k0:m, m:]
    T[k0:m, k0 - 1] = spike
    if want_vecs:
        Z[:, k0:m] = Z[:, k0:m] @ Zw
    # zero the deflated tail
    if d > 0:
        T[m - d:m, k0 - 1] = 0.0
    kept = w - d
    shifts = np.diag(Tw)[:kept].copy()
    if kept > 0:
        # eliminate the remaining spike into a single subdiagonal entry
        x = T[k0:m - d, k0 - 1].copy()
        v, tau, _ = _host_householder(x)
        if tau != 0.0:
            W = np.conj(v) @ T[k0:m - d, :]
            T[k0:m - d, :] -= tau * np.outer(v, W)
            W = T[:, k0:m - d] @ v
            T[:, k0:m - d] -= tau * np.outer(W, np.conj(v))
            if want_vecs:
                W = Z[:, k0:m - d] @ v
                Z[:, k0:m - d] -= tau * np.outer(W, np.conj(v))
        T[k0 + 1:m - d, k0 - 1] = 0.0
        # the window block is now full: restore Hessenberg form
        _rehessenberg(T, Z, k0, m - d, want_vecs)
    return d, shifts


def _hessenberg_qr_host(H: np.ndarray, want_vecs: bool,
                        max_sweeps_per_eig: int = 40,
                        use_aed: bool = True,
                        aed_window: Optional[int] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Complex implicit Hessenberg QR with Wilkinson shifts, deflation,
    aggressive early deflation with window reordering, and small-bulge
    multishift sweeps with accumulated level-3 updates for larger
    problems (reference: spectral/HessenbergSchur/'s AED + multibulge
    tree)."""
    n = H.shape[0]
    if n <= _NATIVE_QR_CUTOFF:
        # serial bottom-level kernel in C++ (zlahqr role): the scalar
        # Givens chase is interpreter-bound in numpy; the native kernel
        # runs it at compiled speed. Falls back to the numpy path below.
        try:
            from ..native import hess_qr_native

            T, Z = hess_qr_native(H, want_vecs, max_sweeps_per_eig)
            return T, (Z if Z is not None else np.eye(n, dtype=complex))
        except RuntimeError:
            pass
    if aed_window is None:
        # LAPACK-style size scaling: larger deflation windows (and hence
        # bigger multibulge shift packets) for larger problems; capped —
        # oversized windows make the native window solves dominate
        # (measured knee ~64 at n=1000 with the native AED)
        aed_window = int(max(32, min(64, n // 6)))
    T = H.astype(np.complex128).copy()
    Z = np.eye(n, dtype=np.complex128)
    eps = np.finfo(np.float64).eps
    m = n
    its = 0
    total_budget = max_sweeps_per_eig * max(n, 1)
    while m > 1 and its < total_budget:
        its += 1
        # deflate tiny subdiagonals in the active window
        deflated = False
        for k in range(m - 1, 0, -1):
            if abs(T[k, k - 1]) <= eps * (abs(T[k, k]) + abs(T[k - 1, k - 1])):
                T[k, k - 1] = 0.0
                if k == m - 1:
                    m -= 1
                    deflated = True
                break
        if deflated:
            continue
        # window start l: first zero subdiagonal below m
        l = 0
        for k in range(m - 1, 0, -1):
            if T[k, k - 1] == 0.0:
                l = k
                break
        win = m - l
        if win > 1 and win <= _NATIVE_QR_CUTOFF:
            # the whole active window fits the native kernel: solve it
            # there and apply the window similarity to the off-window
            # strips as GEMMs (avoids O(win) numpy Givens sweeps)
            try:
                from ..native import hess_qr_native

                Tw, Zw = hess_qr_native(np.ascontiguousarray(T[l:m, l:m]),
                                        True, max_sweeps_per_eig)
                T[l:m, l:m] = Tw
                if m < n:
                    T[l:m, m:] = np.conj(Zw.T) @ T[l:m, m:]
                if l > 0:
                    T[:l, l:m] = T[:l, l:m] @ Zw
                if want_vecs:
                    Z[:, l:m] = Z[:, l:m] @ Zw
                m = l
                continue
            except RuntimeError:
                pass
        if use_aed and win > 3 * aed_window and win > 48:
            w = min(aed_window, win - 1)
            d, shifts = _aed(T, Z, l, m, w, want_vecs, eps)
            if d > 0:
                m -= d
                continue
            # no deflation: one small-bulge multishift sweep driven by
            # the AED shifts (level-3 accumulated updates); packet capped
            # at 64 shifts to keep the accumulation window ~128 wide
            ns = int(min(len(shifts), 64, max(4, win // 6))) & ~1
            _multibulge_sweep(T, Z, l, m, shifts[-ns:], want_vecs)
            its += max(ns // 2, 1)
            continue
        mu = _wilkinson_shift(T, m)
        _single_sweep(T, Z, l, m, mu, want_vecs)
    # clean below-diagonal dust
    T = np.triu(T)
    return T, Z


class SchurDecomposition(NamedTuple):
    T: DistMatrix       # upper triangular (complex)
    Z: DistMatrix       # unitary Schur vectors
    w: jax.Array        # eigenvalues (diag of T)


class QuasiSchurDecomposition(NamedTuple):
    """Real Schur form A = Z T Z^T: T real quasi-upper-triangular with
    standardized 1x1/2x2 diagonal blocks, Z real orthogonal. Eigenvalues
    come back as separate real/imaginary parts so the whole result stays
    in real dtypes (the attached-TPU tunnel cannot move complex
    buffers)."""
    T: DistMatrix
    Z: DistMatrix
    wr: jax.Array
    wi: jax.Array

    @property
    def w(self):
        import numpy as _np

        return _np.asarray(self.wr) + 1j * _np.asarray(self.wi)


def Schur(A: DistMatrix, want_vecs: bool = True, alg: str = "qr",
          form: str = "auto"):
    """Schur decomposition (reference: spectral/Schur.cpp driver).

    Real input (form="auto"/"real") produces the REAL quasi-triangular
    Schur form A = Z T Z^T with standardized 1x1/2x2 blocks — matching
    the reference's real HessenbergSchur — as a QuasiSchurDecomposition
    whose factors stay in real dtypes end-to-end (TPU-transferable).
    Complex input, or form="complex", produces the complex triangular
    form A = Z T Z^H."""
    real_input = not jnp.iscomplexobj(A.data)
    if form == "auto":
        form = "real" if (real_input and alg == "qr") else "complex"
    if form == "real":
        if not real_input:
            raise ValueError("form='real' requires a real matrix")
        return _schur_real_form(A, want_vecs)
    if alg == "sdc":
        return _schur_sdc(A, want_vecs)
    n = A.m
    fact = Hessenberg(LOWER, A)
    Hd = np.asarray(jax.device_get(fact.packed.data))[:n, :n]
    Hh = np.triu(Hd, -1)  # Hessenberg part; below lives the reflectors
    T, Zh = _hessenberg_qr_host(Hh, want_vecs)
    dt = jnp.complex128 if fact.packed.dtype in (jnp.float64, jnp.complex128) \
        else jnp.complex64
    from ..core.dmatrix import pad_array

    # cast on the HOST: TPU backends without c128 support cannot ingest
    # complex128 buffers even transiently
    np_dt = np.complex128 if dt == jnp.complex128 else np.complex64
    Tdm = DistMatrix.from_global(jnp.asarray(T.astype(np_dt)), MC, MR, A.grid)
    w = jnp.asarray(np.diag(T).astype(np_dt))
    if not want_vecs:
        return SchurDecomposition(Tdm, None, w)
    # backtransform: Z = Q_hess * Z_qr
    M = fact.packed.data.shape[0]
    Zfull = jnp.zeros((M, M), dt)
    Zfull = Zfull.at[:n, :n].set(jnp.asarray(Zh.astype(np_dt)))
    packed_c = fact.packed.with_data(fact.packed.data.astype(dt))
    from .condense import HessenbergFactorization

    fc = HessenbergFactorization(packed_c, fact.tau.astype(dt))
    Zd = hessenberg_apply_q(fc, Zfull, adjoint=False)
    Zdm = DistMatrix.from_padded(Zd, n, n, MC, MR, A.grid, A.wrap)
    Zdm = Zdm.with_data(Zdm.mask_padding(Zdm.data))
    return SchurDecomposition(Tdm, Zdm, w)


def _schur_real_form(A: DistMatrix, want_vecs: bool
                     ) -> QuasiSchurDecomposition:
    """Real quasi-triangular Schur form via on-device real Hessenberg
    reduction + the host real AED/multibulge QR iteration
    (reference: spectral/HessenbergSchur/ real path). T and Z stay in
    A's real dtype; eigenvalues return as (wr, wi)."""
    from .schur_real import hessenberg_qr_real_host, quasi_eigvals

    n = A.m
    fact = Hessenberg(LOWER, A)
    Hd = np.asarray(jax.device_get(fact.packed.data))[:n, :n]
    Hh = np.triu(Hd.astype(np.float64), -1)
    T, Zh = hessenberg_qr_real_host(Hh, want_vecs)
    wr, wi = quasi_eigvals(T)
    np_dt = np.float64 if fact.packed.dtype == jnp.float64 else np.float32
    Tdm = DistMatrix.from_global(jnp.asarray(T.astype(np_dt)), MC, MR,
                                 A.grid)
    wr_j = jnp.asarray(wr.astype(np_dt))
    wi_j = jnp.asarray(wi.astype(np_dt))
    if not want_vecs:
        return QuasiSchurDecomposition(Tdm, None, wr_j, wi_j)
    # backtransform: Z = Q_hess * Z_qr (all real, on device)
    M = fact.packed.data.shape[0]
    dt = fact.packed.dtype
    Zfull = jnp.zeros((M, M), dt)
    Zfull = Zfull.at[:n, :n].set(jnp.asarray(Zh.astype(np_dt)))
    Zd = hessenberg_apply_q(fact, Zfull, adjoint=False)
    Zdm = DistMatrix.from_padded(Zd, n, n, MC, MR, A.grid, A.wrap)
    Zdm = Zdm.with_data(Zdm.mask_padding(Zdm.data))
    return QuasiSchurDecomposition(Tdm, Zdm, wr_j, wi_j)


def _schur_sdc(A: DistMatrix, want_vecs: bool, min_block: int = 32,
               depth: int = 0) -> SchurDecomposition:
    """Sign-based spectral divide-and-conquer
    (reference: Schur/SDC.hpp): split the spectrum at the mean trace
    with S = sign(A - sigma I), extract the invariant subspace with a
    rank-revealing QR of the projector, recurse on the diagonal blocks.
    Falls back to the QR path for small/ill-split blocks."""
    n = A.m
    if n <= min_block or depth > 20:
        return Schur(A, want_vecs, alg="qr")
    from .funcs import Sign
    from .qr import _qr_packed
    from ..blas.level1 import ShiftDiagonal, Trace as _tr

    sigma = jnp.trace(A.data[:n, :n]) / n
    S = Sign(ShiftDiagonal(A.redistribute(MC, MR), -sigma))
    Pm = S.with_data(0.5 * (jnp.eye(S.data.shape[0], dtype=S.dtype)
                            * (jnp.arange(S.data.shape[0]) < n)[None, :]
                            - S.data))
    # rank = # eigenvalues left of sigma
    k = int(np.round(float(jnp.real(jnp.trace(Pm.data[:n, :n])))))
    if k == 0 or k == n:
        return Schur(A, want_vecs, alg="qr")
    # randomized range finder (blocked QR of P G) — O(n^2 k) MXU work,
    # first k columns span the invariant subspace w.h.p.
    from .reflect import ExpandPackedReflectors

    key = jax.random.key(4321 + depth)
    G = jax.random.normal(key, (n, n), jnp.real(Pm.data).dtype).astype(
        Pm.dtype)
    PG = Pm.data[:n, :n] @ G
    packed, tau = _qr_packed(PG, n, n, 64)
    Qfull = ExpandPackedReflectors(packed, tau, 64, n, n)
    q = Qfull[:n, :n]
    Ad = A.redistribute(MC, MR).data[:n, :n]
    At = jnp.conj(q.T) @ Ad @ q  # block upper triangular (approx)
    A11 = DistMatrix.from_global(At[:k, :k], MC, MR, A.grid)
    A22 = DistMatrix.from_global(At[k:, k:], MC, MR, A.grid)
    S1 = _schur_sdc(A11, want_vecs, min_block, depth + 1)
    S2 = _schur_sdc(A22, want_vecs, min_block, depth + 1)
    T = jnp.zeros((n, n), S1.T.dtype)
    Z1 = S1.Z.data[:k, :k]
    Z2 = S2.Z.data[: n - k, : n - k]
    T = T.at[:k, :k].set(S1.T.data[:k, :k])
    T = T.at[k:, k:].set(S2.T.data[: n - k, : n - k])
    A12t = At[:k, k:].astype(T.dtype)
    T = T.at[:k, k:].set(jnp.conj(Z1.T) @ A12t @ Z2)
    Zc = jnp.zeros((n, n), S1.T.dtype)
    Zc = Zc.at[:k, :k].set(Z1)
    Zc = Zc.at[k:, k:].set(Z2)
    Zfin = q.astype(T.dtype) @ Zc
    Tdm = DistMatrix.from_global(T, MC, MR, A.grid)
    Zdm = DistMatrix.from_global(Zfin, MC, MR, A.grid)
    return SchurDecomposition(Tdm, Zdm, jnp.diagonal(T))


def TriangEig(T: DistMatrix, blocksize: int = 128) -> DistMatrix:
    """Eigenvectors of an upper triangular matrix via the BLOCKED
    multi-shift backward substitution (reference: spectral/TriangEig.cpp
    on MultiShiftTrsm.cpp's blocked sweep). Column j solves rows<j of
    (T - t_jj) x = 0 with x_j = 1; per window only an
    (n, nb, nb) shifted-diagonal batch is transient — O(n^2) memory
    total, where the round-2 vmapped form was O(n^3)."""
    from ..blas.multishift import ms_blocked_upper

    n = T.m
    Td = T.replicated()
    M = Td.shape[0]
    lam = jnp.diagonal(Td)[:n]
    idx = jnp.arange(n)
    B0 = jnp.zeros((M, n), Td.dtype).at[idx, idx].set(1)
    X = ms_blocked_upper(Td, lam, B0, blocksize,
                         row_limit=idx, mrows=n)[:n, :]
    nx = jnp.sqrt(jnp.sum(jnp.abs(X) ** 2, axis=0))
    X = X / jnp.where(nx == 0, 1, nx)[None, :]
    return DistMatrix.from_global(X, MC, MR, T.grid)


def QuasiTriangEig(T: DistMatrix, split: bool = False):
    """Eigenvectors of a real quasi-upper-triangular matrix (real Schur
    form; reference: spectral/QuasiTriangEig.cpp). For each eigenvalue
    the shifted matrix is a complex quasi-Hessenberg matrix with the
    SAME isolated couplings, so each column solves by the disjoint-Givens
    pre-elimination (blas/quasi.py) + one batched triangular solve —
    all columns vmapped. Complex triangular input degrades to TriangEig.

    Returns a complex DistMatrix, or with ``split=True`` a pair
    (XR, XI) of real DistMatrices (TPU-transferable)."""
    n = T.m
    Td = T.replicated()[:n, :n]
    if jnp.iscomplexobj(Td):
        X = TriangEig(T)
        if split:
            return (X.with_data(jnp.real(X.data)),
                    X.with_data(jnp.imag(X.data)))
        return X
    from .schur_real import block_starts, quasi_eigvals

    Th = np.asarray(jax.device_get(Td)).astype(np.float64)
    wr, wi = quasi_eigvals(Th)
    lam = wr + 1j * wi
    cuts = np.zeros(n, np.int32)
    B = np.zeros((n, n), np.complex128)  # per-eigenvalue RHS (block vec)
    for k, sz in block_starts(Th):
        if sz == 1:
            cuts[k] = k
            B[k, k] = 1.0
        else:
            t11, t12 = Th[k, k], Th[k, k + 1]
            t21, t22 = Th[k + 1, k], Th[k + 1, k + 1]
            lam1 = lam[k]
            # eigenvector of the standardized 2x2 for lam1 = p + iq
            if abs(t12) >= abs(t21):
                a, b = t12, lam1 - t11
            else:
                a, b = lam1 - t22, t21
            nv = np.hypot(abs(a), abs(b))
            a, b = a / nv, b / nv
            cuts[k] = k
            cuts[k + 1] = k
            B[k, k], B[k + 1, k] = a, b
            B[k, k + 1], B[k + 1, k + 1] = np.conj(a), np.conj(b)
    cdt = jnp.complex128 if Td.dtype == jnp.float64 else jnp.complex64
    Tc = jnp.asarray(Th).astype(cdt)
    lam_j = jnp.asarray(lam).astype(cdt)
    cuts_j = jnp.asarray(cuts)
    B_j = jnp.asarray(B).astype(cdt)
    # blocked multi-shift engine: the shifted matrices share T's quasi
    # band, so the window sweep batches every eigenvalue at O(n * nb^2)
    # transient memory (was a vmapped full (n, n) matrix per eigenvalue)
    from ..blas.multishift import ms_blocked_upper
    from ..blas.quasi import _prep_quasi

    Tq = _prep_quasi(Tc, n, n)
    X = ms_blocked_upper(Tq, lam_j, B_j, 128, quasi=True,
                         row_limit=cuts_j, mrows=n)
    nx = jnp.sqrt(jnp.sum(jnp.abs(X) ** 2, axis=0))
    X = X / jnp.where(nx == 0, 1, nx)[None, :]
    if split:
        XR = DistMatrix.from_global(jnp.real(X).astype(Td.dtype), MC, MR,
                                    T.grid)
        XI = DistMatrix.from_global(jnp.imag(X).astype(Td.dtype), MC, MR,
                                    T.grid)
        return XR, XI
    return DistMatrix.from_global(X, MC, MR, T.grid)


class EigDecomposition(NamedTuple):
    w: jax.Array
    X: DistMatrix


def Eig(A: DistMatrix, want_vecs: bool = True, alg: str = "qr",
        form: str = "auto"):
    """General (non-Hermitian) eigendecomposition via Schur +
    (Quasi)TriangEig (reference: spectral/Eig.cpp). Real input routes
    through the real quasi-triangular Schur form; eigenvalues/vectors
    are complex either way."""
    dec = Schur(A, want_vecs=want_vecs, alg=alg, form=form)
    if isinstance(dec, QuasiSchurDecomposition):
        w = jnp.asarray(dec.w)
        if not want_vecs:
            return w
        Y = QuasiTriangEig(dec.T)
        X = Gemm(NORMAL, NORMAL, 1.0,
                 dec.Z.with_data(dec.Z.data.astype(Y.dtype)), Y)
        nx = jnp.sqrt(jnp.sum(jnp.abs(X.data) ** 2, axis=0))
        X = X.with_data(X.data / jnp.where(nx == 0, 1, nx)[None, :])
        return EigDecomposition(w, X)
    if not want_vecs:
        return dec.w
    Y = TriangEig(dec.T)
    X = Gemm(NORMAL, NORMAL, 1.0,
             dec.Z.with_data(dec.Z.data.astype(Y.dtype)), Y)
    # normalize columns
    nx = jnp.sqrt(jnp.sum(jnp.abs(X.data) ** 2, axis=0))
    X = X.with_data(X.data / jnp.where(nx == 0, 1, nx)[None, :])
    return EigDecomposition(dec.w, X)


def _swap_adjacent(T: np.ndarray, Z, k: int) -> None:
    """Swap eigenvalues T[k,k] and T[k+1,k+1] of a complex upper
    triangular T by a unitary similarity, updating T (and Z) in place
    (reference: spectral/Schur/SchurSwap; LAPACK ztrexc's Givens step)."""
    a = T[k, k]
    b = T[k, k + 1]
    c = T[k + 1, k + 1]
    # eigenvector of [[a, b], [0, c]] for eigenvalue c: v = (b, c - a)
    v0, v1 = b, c - a
    nrm = np.hypot(abs(v0), abs(v1))
    if nrm == 0.0:  # equal eigenvalues with b == 0: nothing to do
        return
    cs = v0 / nrm
    sn = v1 / nrm
    G = np.array([[cs, -np.conj(sn)], [sn, np.conj(cs)]])
    T[k:k + 2, :] = G.conj().T @ T[k:k + 2, :]
    T[:, k:k + 2] = T[:, k:k + 2] @ G
    T[k + 1, k] = 0.0
    if Z is not None:
        Z[:, k:k + 2] = Z[:, k:k + 2] @ G


def _quasi_from_np(dec, T, Z):
    from .schur_real import quasi_eigvals

    wr, wi = quasi_eigvals(T)
    dt = np.float64 if dec.T.dtype == jnp.float64 else np.float32
    Tdm = DistMatrix.from_global(jnp.asarray(T.astype(dt)), MC, MR,
                                 dec.T.grid)
    Zdm = None if Z is None else DistMatrix.from_global(
        jnp.asarray(Z.astype(dt)), MC, MR, dec.T.grid)
    return QuasiSchurDecomposition(Tdm, Zdm, jnp.asarray(wr.astype(dt)),
                                   jnp.asarray(wi.astype(dt)))


def SchurSwap(dec, k: int):
    """Swap adjacent eigenvalues (or, for the real quasi form, the
    adjacent diagonal BLOCKS meeting at row k) of a Schur decomposition
    (reference: spectral/Schur/SchurSwap)."""
    if isinstance(dec, QuasiSchurDecomposition):
        from .schur_real import _swap_blocks_np, block_starts

        n = dec.T.m
        T = np.asarray(jax.device_get(dec.T.data)).astype(
            np.float64)[:n, :n].copy()
        Z = None if dec.Z is None else np.asarray(
            jax.device_get(dec.Z.data)).astype(np.float64)[:n, :n].copy()
        blocks = dict(block_starts(T))
        if k not in blocks:
            raise ValueError(f"row {k} is not a block boundary")
        p = blocks[k]
        q = blocks.get(k + p)
        if q is None:
            raise ValueError(f"no block follows position {k}")
        _swap_blocks_np(T, Z, k, p, q, Z is not None)
        return _quasi_from_np(dec, T, Z)
    n = dec.T.m
    T = np.asarray(jax.device_get(dec.T.data))[:n, :n].copy()
    Z = None if dec.Z is None else \
        np.asarray(jax.device_get(dec.Z.data))[:n, :n].copy()
    _swap_adjacent(T, Z, k)
    Tdm = DistMatrix.from_global(jnp.asarray(T), MC, MR, dec.T.grid)
    Zdm = None if Z is None else DistMatrix.from_global(
        jnp.asarray(Z), MC, MR, dec.T.grid)
    return SchurDecomposition(Tdm, Zdm, jnp.diagonal(jnp.asarray(T)))


def ReorderSchur(dec, select):
    """Move the selected eigenvalues to the leading diagonal positions by
    adjacent swaps (LAPACK ztrsen's/dtrsen's reordering role; enables
    deflating-subspace extraction from the QR-iteration path). For the
    real quasi form, 2x2 blocks move as units — a block is selected when
    any of its rows is selected."""
    if isinstance(dec, QuasiSchurDecomposition):
        from .schur_real import _swap_blocks_np, block_starts

        n = dec.T.m
        T = np.asarray(jax.device_get(dec.T.data)).astype(
            np.float64)[:n, :n].copy()
        Z = None if dec.Z is None else np.asarray(
            jax.device_get(dec.Z.data)).astype(np.float64)[:n, :n].copy()
        sel = np.asarray(select, bool).copy()
        top = 0
        while True:
            blocks = block_starts(T)
            moved = False
            for bi, (k, sz) in enumerate(blocks):
                if k < top:
                    continue
                if sel[k:k + sz].any():
                    # bubble this block up to `top` by adjacent swaps
                    for j in range(bi - 1, -1, -1):
                        ak, asz = blocks[j][0], blocks[j][1]
                        if ak < top:
                            break
                        _swap_blocks_np(T, Z, ak, asz, sz, Z is not None)
                        # keep the selection mask aligned with the rows
                        blk_sel = sel[ak + asz:ak + asz + sz].copy()
                        ab_sel = sel[ak:ak + asz].copy()
                        sel[ak:ak + sz] = blk_sel
                        sel[ak + sz:ak + sz + asz] = ab_sel
                        blocks[j] = (ak, sz)
                        blocks[j + 1] = (ak + sz, asz)
                    top += sz
                    moved = True
                    break
            if not moved:
                break
        return _quasi_from_np(dec, T, Z)
    n = dec.T.m
    T = np.asarray(jax.device_get(dec.T.data))[:n, :n].copy()
    Z = None if dec.Z is None else \
        np.asarray(jax.device_get(dec.Z.data))[:n, :n].copy()
    sel = np.asarray(select, bool).copy()
    top = 0
    for i in range(n):
        if sel[i]:
            for k in range(i - 1, top - 1, -1):  # bubble up
                _swap_adjacent(T, Z, k)
            top += 1
    Tdm = DistMatrix.from_global(jnp.asarray(T), MC, MR, dec.T.grid)
    Zdm = None if Z is None else DistMatrix.from_global(
        jnp.asarray(Z), MC, MR, dec.T.grid)
    return SchurDecomposition(Tdm, Zdm, jnp.diagonal(jnp.asarray(T)))


def HessenbergSchur(H: DistMatrix, want_vecs: bool = True,
                    form: str = "auto"):
    """Schur form of an ALREADY upper-Hessenberg matrix (reference:
    spectral/HessenbergSchur.hpp public entry): skips the condensation
    and runs the (real or complex) QR iteration directly; Z is the QR
    iteration's accumulated transform (H = Z T Z^H)."""
    n = H.m
    real_input = not jnp.iscomplexobj(H.data)
    if form == "auto":
        form = "real" if real_input else "complex"
    Hd = np.asarray(jax.device_get(H.replicated()))[:n, :n]
    if form == "real":
        if not real_input:
            raise ValueError("form='real' requires a real matrix")
        from .schur_real import hessenberg_qr_real_host, quasi_eigvals

        T, Zh = hessenberg_qr_real_host(
            np.triu(Hd.astype(np.float64), -1), want_vecs)
        wr, wi = quasi_eigvals(T)
        np_dt = np.float64 if H.dtype == jnp.float64 else np.float32
        Tdm = DistMatrix.from_global(jnp.asarray(T.astype(np_dt)), MC, MR,
                                     H.grid)
        Zdm = None if not want_vecs else DistMatrix.from_global(
            jnp.asarray(Zh.astype(np_dt)), MC, MR, H.grid)
        return QuasiSchurDecomposition(Tdm, Zdm, jnp.asarray(wr),
                                       jnp.asarray(wi))
    T, Zh = _hessenberg_qr_host(np.triu(Hd, -1).astype(np.complex128),
                                want_vecs)
    np_dt = np.complex128 if H.dtype in (jnp.float64, jnp.complex128) \
        else np.complex64
    Tdm = DistMatrix.from_global(jnp.asarray(T.astype(np_dt)), MC, MR,
                                 H.grid)
    w = jnp.asarray(np.diag(T).astype(np_dt))
    Zdm = None if not want_vecs else DistMatrix.from_global(
        jnp.asarray(Zh.astype(np_dt)), MC, MR, H.grid)
    return SchurDecomposition(Tdm, Zdm, w)


def HessenbergEig(H: DistMatrix, form: str = "auto") -> jax.Array:
    """Eigenvalues of an upper-Hessenberg matrix (reference:
    spectral.hpp HessenbergEig)."""
    dec = HessenbergSchur(H, want_vecs=False, form=form)
    return jnp.asarray(dec.w)
