"""Real quasi-triangular Schur form: Francis double-shift QR with real
aggressive early deflation and real small-bulge multishift sweeps.

Reference: src/lapack_like/spectral/HessenbergSchur/ computes the REAL
quasi-triangular Schur form for real input (1x1/2x2 diagonal blocks);
Schur/SchurSwap and the AED reordering operate on those blocks. This
module is the host-side real counterpart of the complex machinery in
``schur.py`` — the same AED + multibulge architecture, in real
arithmetic, producing standardized 2x2 blocks (equal diagonal,
off-diagonal product < 0, eigenvalues p ± sqrt(-bc) i).

Why it exists (and not just the complex path): the attached-TPU tunnel
cannot transfer complex buffers, so a complex-only Schur chain can never
touch the accelerator for real inputs. The real form keeps T and Z in
real dtypes end-to-end; eigenvalues come back as (wr, wi) real pairs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_NATIVE_REAL_QR_CUTOFF = 384


def _standardize2x2_np(T: np.ndarray, Z: Optional[np.ndarray], k: int,
                       want_vecs: bool) -> None:
    """Rotate the 2x2 block at (k, k+1) to standard form in place:
    real eigenvalues -> split (T[k+1,k]=0); complex pair -> equal
    diagonals with T[k,k+1]*T[k+1,k] < 0 (the dlanv2 role)."""
    n = T.shape[0]
    a, b = T[k, k], T[k, k + 1]
    c, d = T[k + 1, k], T[k + 1, k + 1]
    if c == 0.0:
        return
    disc = 0.25 * (a - d) ** 2 + b * c
    if disc >= 0.0:
        rt = np.sqrt(disc)
        tr = a + d
        lam1 = 0.5 * tr + (rt if tr >= 0 else -rt)
        if abs(b) + abs(lam1 - a) > abs(lam1 - d) + abs(c):
            v0, v1 = b, lam1 - a
        else:
            v0, v1 = lam1 - d, c
        nrm = np.hypot(v0, v1)
        cs, sn = (1.0, 0.0) if nrm == 0.0 else (v0 / nrm, v1 / nrm)
    else:
        th = 0.5 * np.arctan2(d - a, b + c)
        cs, sn = np.cos(th), np.sin(th)
    G = np.array([[cs, -sn], [sn, cs]])
    T[k:k + 2, k:] = G.T @ T[k:k + 2, k:]
    T[:k + 2, k:k + 2] = T[:k + 2, k:k + 2] @ G
    if want_vecs and Z is not None:
        Z[:, k:k + 2] = Z[:, k:k + 2] @ G
    # exact structural zeros
    a, b = T[k, k], T[k, k + 1]
    c, d = T[k + 1, k], T[k + 1, k + 1]
    if 0.25 * (a - d) ** 2 + b * c >= 0.0 or c == 0.0 or b == 0.0:
        T[k + 1, k] = 0.0
    else:
        # complex pair: the rotation leaves the diagonals equal only to
        # rounding; pin both to the mean as dlanv2 does (the standard
        # form CheckRealSchur verifies EXACTLY)
        mean = 0.5 * (a + d)
        T[k, k] = T[k + 1, k + 1] = mean


def block_starts(T: np.ndarray, lo: int = 0, hi: Optional[int] = None
                 ) -> List[Tuple[int, int]]:
    """(start, size) list of the quasi-triangular diagonal blocks of
    T[lo:hi, lo:hi]."""
    n = T.shape[0] if hi is None else hi
    out = []
    k = lo
    while k < n:
        if k + 1 < n and T[k + 1, k] != 0.0:
            out.append((k, 2))
            k += 2
        else:
            out.append((k, 1))
            k += 1
    return out


def quasi_eigvals(T: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(wr, wi) eigenvalues of a standardized quasi-triangular T."""
    n = T.shape[0]
    wr = np.zeros(n)
    wi = np.zeros(n)
    for k, sz in block_starts(T):
        if sz == 1:
            wr[k] = T[k, k]
        else:
            p = 0.5 * (T[k, k] + T[k + 1, k + 1])
            q2 = -T[k, k + 1] * T[k + 1, k] - 0.25 * (
                T[k, k] - T[k + 1, k + 1]) ** 2
            q = np.sqrt(max(q2, 0.0))
            wr[k] = wr[k + 1] = p
            wi[k], wi[k + 1] = q, -q
    return wr, wi


def _swap_blocks_np(T: np.ndarray, Z: Optional[np.ndarray], k: int,
                    p: int, q: int, want_vecs: bool) -> None:
    """Swap the adjacent diagonal blocks T[k:k+p, k:k+p] and
    T[k+p:k+p+q, k+p:k+p+q] by an orthogonal similarity (the direct-swap
    method: solve the small Sylvester equation A11 X - X A22 = A12, then
    QR of [[-X],[I]] — reference: spectral/Schur/SchurSwap role for real
    block pairs; Bai-Demmel swapping)."""
    n = T.shape[0]
    A11 = T[k:k + p, k:k + p]
    A12 = T[k:k + p, k + p:k + p + q]
    A22 = T[k + p:k + p + q, k + p:k + p + q]
    K = np.kron(np.eye(q), A11) - np.kron(A22.T, np.eye(p))
    try:
        x = np.linalg.solve(K, A12.reshape(-1, order="F"))
    except np.linalg.LinAlgError:
        # identical eigenvalues: swapping is a no-op semantically
        return
    X = x.reshape((p, q), order="F")
    M = np.vstack([-X, np.eye(q)])
    Qf, _ = np.linalg.qr(M, mode="complete")
    w = p + q
    T[k:k + w, :] = Qf.T @ T[k:k + w, :]
    T[:, k:k + w] = T[:, k:k + w] @ Qf
    if want_vecs and Z is not None:
        Z[:, k:k + w] = Z[:, k:k + w] @ Qf
    # enforce the swapped block-triangular structure exactly
    T[k + q:k + w, k:k + q] = 0.0
    if q == 2:
        _standardize2x2_np(T, Z, k, want_vecs)
    if p == 2:
        _standardize2x2_np(T, Z, k + q, want_vecs)


def _reflector3_real(v: np.ndarray):
    nrm = np.linalg.norm(v)
    if nrm == 0.0:
        return np.zeros_like(v), 0.0
    beta = -nrm if v[0] >= 0 else nrm
    vh = v.copy()
    vh[0] -= beta
    vn2 = vh @ vh
    if vn2 == 0.0:
        return np.zeros_like(v), 0.0
    return vh, 2.0 / vn2


def _house_real(x: np.ndarray):
    nrm = np.linalg.norm(x)
    if nrm == 0.0:
        return np.zeros_like(x), 0.0
    beta = -nrm if x[0] >= 0 else nrm
    v = x.copy()
    v[0] -= beta
    vn2 = v @ v
    if vn2 == 0.0:
        return np.zeros_like(x), 0.0
    return v, 2.0 / vn2


def _rehessenberg_real(T, Z, k0, k1, want_vecs) -> None:
    """Reduce T[k0:k1, k0:k1] back to upper Hessenberg by real
    Householder similarities applied across the full matrix."""
    for j in range(k0, k1 - 2):
        x = T[j + 1:k1, j].copy()
        v, tau = _house_real(x)
        if tau == 0.0:
            continue
        W = v @ T[j + 1:k1, :]
        T[j + 1:k1, :] -= tau * np.outer(v, W)
        W = T[:, j + 1:k1] @ v
        T[:, j + 1:k1] -= tau * np.outer(W, v)
        if want_vecs:
            W = Z[:, j + 1:k1] @ v
            Z[:, j + 1:k1] -= tau * np.outer(W, v)
        T[j + 2:k1, j] = 0.0


def _francis_sweep(T, Z, l, m, tr, det, want_vecs) -> None:
    """One implicit Francis double-shift sweep on window [l, m): chase a
    3x3 bulge whose shifts have sum ``tr`` and product ``det`` (real for
    a conjugate pair or two real shifts)."""
    n = T.shape[0]
    h00, h01 = T[l, l], T[l, l + 1]
    h10, h11 = T[l + 1, l], T[l + 1, l + 1]
    x0 = h00 * h00 + h01 * h10 - tr * h00 + det
    x1 = h10 * (h00 + h11 - tr)
    x2 = h10 * T[l + 2, l + 1] if m - l > 2 else 0.0
    sc = abs(x0) + abs(x1) + abs(x2)
    if sc != 0.0:
        x0, x1, x2 = x0 / sc, x1 / sc, x2 / sc
    first = np.array([x0, x1, x2])
    for k in range(l, m - 1):
        ln = 3 if k < m - 2 else 2
        if k == l:
            v, tau = _reflector3_real(first[:ln])
        else:
            v, tau = _reflector3_real(
                T[k:k + ln, k - 1].copy())
        if tau != 0.0:
            c0 = k - 1 if k > l else l
            rows = slice(k, k + ln)
            W = v @ T[rows, c0:]
            T[rows, c0:] -= tau * np.outer(v, W)
            hi = min(k + ln + 1, m)
            W = T[:hi, rows] @ v
            T[:hi, rows] -= tau * np.outer(W, v)
            if want_vecs:
                W = Z[:, rows] @ v
                Z[:, rows] -= tau * np.outer(W, v)
        if k > l:
            T[k + 1:k + ln, k - 1] = 0.0


def _multibulge_sweep_real(T, Z, l, m, pairs, want_vecs,
                           accum_extra=32) -> None:
    """Real small-bulge multishift QR sweep with accumulated (level-3)
    updates on window [l, m). ``pairs`` is a list of (tr, det) shift
    pairs (conjugate pairs or two reals); each pair drives one 3x3
    bulge spaced 3 rows apart (same batching architecture as the
    complex `_multibulge_sweep` in schur.py)."""
    win = m - l
    nbulge = len(pairs)
    if nbulge == 0:
        return
    if win < 12 or nbulge < 2:
        for tr, det in pairs:
            _francis_sweep(T, Z, l, m, tr, det, want_vecs)
        return
    nb = min(nbulge, max(1, (win - 3) // 3))
    pairs = pairs[:nb]
    n = T.shape[0]
    total = (m - 2 - l) + 3 * (nb - 1) + 1
    t = 0
    while t < total:
        top_pos = min(l + max(t - 3 * (nb - 1), 0), m - 2)
        span = min(accum_extra + 3 * nb, total - t)
        k1 = max(top_pos - 1, l)
        k2 = min(l + (t + span - 1) + 5, m)
        w = k2 - k1
        # native windowed chase (native/elx_chase.cpp, pair_mode=1) —
        # see the complex driver's note in schur.py::_multibulge_sweep
        try:
            from ..native import real_chase_native

            Tw = np.ascontiguousarray(T[k1:k2, k1:k2])
            U = real_chase_native(
                Tw, np.ascontiguousarray(
                    np.asarray(pairs, np.float64).ravel()),
                nb, t, span, l, m, k1, k2)
            T[k1:k2, k1:k2] = Tw
            if k2 < n:
                T[k1:k2, k2:] = U.T @ T[k1:k2, k2:]
            if k1 > 0:
                T[:k1, k1:k2] = T[:k1, k1:k2] @ U
            if want_vecs:
                Z[:, k1:k2] = Z[:, k1:k2] @ U
            t += span
            continue
        except RuntimeError:
            pass
        U = np.eye(w)

        def _apply_one(vh, tau, rows, c0):
            if tau == 0.0:
                return
            Wl = vh @ T[rows, c0:k2]
            T[rows, c0:k2] -= tau * np.outer(vh, Wl)
            rend = min(rows.stop + 1, k2)
            Wr = T[k1:rend, rows] @ vh
            T[k1:rend, rows] -= tau * np.outer(Wr, vh)
            ur = slice(rows.start - k1, rows.stop - k1)
            Wu = U[:, ur] @ vh
            U[:, ur] -= tau * np.outer(Wu, vh)

        for step in range(t, t + span):
            ks = []
            intro = False
            for j in range(nb):
                p = step - 3 * j
                if p < 0 or p > m - 2 - l:
                    continue
                if p == 0:
                    intro = True
                    continue
                k = l + p - 1
                if k >= m - 2:
                    continue
                if k == m - 3:
                    v = T[k + 1:m, k].copy()
                    vh, tau = _reflector3_real(v)
                    _apply_one(vh, tau, slice(k + 1, m), k)
                    T[k + 2:m, k] = 0.0
                    continue
                ks.append(k)
            if ks:
                ka = np.asarray(ks)
                ridx = ka[:, None] + np.arange(1, 4)[None, :]
                V = T[ridx, ka[:, None]]
                nrm = np.sqrt(np.sum(V * V, axis=1))
                beta = np.where(V[:, 0] >= 0, -nrm, nrm)
                Vh = V.copy()
                Vh[:, 0] -= beta
                vn2 = np.sum(Vh * Vh, axis=1)
                tau = np.where(vn2 > 0, 2.0 / np.where(vn2 == 0, 1, vn2),
                               0.0)
                G = T[ridx, k1:k2]
                Wl = np.einsum("bi,biw->bw", Vh, G)
                G -= (tau[:, None] * Vh)[:, :, None] * Wl[:, None, :]
                T[ridx, k1:k2] = G
                G = T[k1:k2, :][:, ridx]
                Wr = np.einsum("wbi,bi->wb", G, Vh)
                G -= Wr[:, :, None] * (tau[:, None] * Vh)[None]
                T[k1:k2, ridx.ravel()] = G.reshape(w, -1)
                G = U[:, ridx - k1]
                Wu = np.einsum("wbi,bi->wb", G, Vh)
                G -= Wu[:, :, None] * (tau[:, None] * Vh)[None]
                U[:, (ridx - k1).ravel()] = G.reshape(w, -1)
                T[ridx[:, 1:], ka[:, None]] = 0.0
            if intro:
                j = step // 3
                tr, det = pairs[j]
                h00, h01 = T[l, l], T[l, l + 1]
                h10, h11 = T[l + 1, l], T[l + 1, l + 1]
                v0 = h00 * h00 + h01 * h10 - tr * h00 + det
                v1 = h10 * (h00 + h11 - tr)
                if m - l >= 3:
                    v = np.array([v0, v1, h10 * T[l + 2, l + 1]])
                else:
                    v = np.array([v0, v1])
                sc = np.abs(v).sum()
                if sc != 0:
                    v = v / sc
                vh, tau = _reflector3_real(v)
                _apply_one(vh, tau, slice(l, l + v.shape[0]), k1)
        if k2 < n:
            T[k1:k2, k2:] = U.T @ T[k1:k2, k2:]
        if k1 > 0:
            T[:k1, k1:k2] = T[:k1, k1:k2] @ U
        if want_vecs:
            Z[:, k1:k2] = Z[:, k1:k2] @ U
        t += span
    for k in range(l, m - 2):
        T[k + 2:min(k + 4, m), k] = 0.0


def _shift_pairs_from_blocks(Tw: np.ndarray, kept: int
                             ) -> List[Tuple[float, float]]:
    """(tr, det) bulge pairs from the leading ``kept`` rows of a
    standardized quasi-triangular window: 2x2 blocks give conjugate
    pairs; 1x1 blocks are paired among themselves."""
    pairs = []
    reals = []
    for k, sz in block_starts(Tw, 0, kept):
        if sz == 2 and k + 1 < kept:
            tr = Tw[k, k] + Tw[k + 1, k + 1]
            det = Tw[k, k] * Tw[k + 1, k + 1] - Tw[k, k + 1] * Tw[k + 1, k]
            pairs.append((tr, det))
        else:
            reals.append(Tw[k, k])
    for i in range(0, len(reals) - 1, 2):
        pairs.append((reals[i] + reals[i + 1], reals[i] * reals[i + 1]))
    if len(reals) % 2 == 1:
        pairs.append((2 * reals[-1], reals[-1] * reals[-1]))
    return pairs


def _aed_real(T, Z, l, m, w, want_vecs, eps
              ) -> Tuple[int, List[Tuple[float, float]]]:
    """Real aggressive early deflation on the trailing w x w window of
    [l, m): real Schur of the window, bottom-up per-BLOCK deflation
    tests on the spike, undeflatable blocks bubbled to the window top by
    orthogonal block swaps. Returns (#deflated rows, shift pairs)."""
    k0 = m - w
    Hw = T[k0:m, k0:m].copy()
    beta = T[k0, k0 - 1]
    try:
        from ..native import real_aed_native

        # full window-local native AED: window Schur + reorder + spike
        # elimination + re-Hessenberg accumulated into W; apply W to the
        # off-window strips here as GEMMs
        Tw, W, d, gamma, shifts = real_aed_native(Hw, beta, eps)
        kept = w - d
        T[k0:m, k0:m] = Tw
        if k0 > 0:
            T[:k0, k0:m] = T[:k0, k0:m] @ W
        if m < T.shape[0]:
            T[k0:m, m:] = W.T @ T[k0:m, m:]
        if want_vecs:
            Z[:, k0:m] = Z[:, k0:m] @ W
        T[k0:m, k0 - 1] = 0.0
        T[k0, k0 - 1] = gamma
        # build (tr, det) bulge pairs from the kept eigenvalues
        pairs: List[Tuple[float, float]] = []
        reals: List[float] = []
        i = 0
        while i < kept:
            if shifts[i].imag != 0.0 and i + 1 < kept:
                lam = shifts[i]
                pairs.append((2 * lam.real, abs(lam) ** 2))
                i += 2
            else:
                reals.append(shifts[i].real)
                i += 1
        for i in range(0, len(reals) - 1, 2):
            pairs.append((reals[i] + reals[i + 1], reals[i] * reals[i + 1]))
        if len(reals) % 2 == 1:
            pairs.append((2 * reals[-1], reals[-1] ** 2))
        return d, pairs
    except RuntimeError:
        Tw, Zw = hessenberg_qr_real_host(Hw, True, use_aed=True,
                                         aed_window=max(8, w // 4))
        scale = max(np.max(np.abs(np.diag(Tw))), abs(beta), 1e-300)
        # bottom-up per-block testing; undeflatable blocks bubble up
        u = 0  # rows [0, u) hold undeflatable blocks
        blocks = block_starts(Tw)
        bi = len(blocks) - 1
        while bi >= 0 and blocks[bi][0] >= u:
            k, sz = blocks[bi]
            spike = beta * Zw[0, k:k + sz]
            foot = max(np.max(np.abs(np.diag(Tw[k:k + sz, k:k + sz]))),
                       1e-300)
            if np.max(np.abs(spike)) <= eps * max(foot, scale):
                bi -= 1  # deflatable: leave at the bottom
            else:
                # bubble this block up to position u by adjacent swaps
                psz = sz
                j = bi - 1
                while j >= 0 and blocks[j][0] >= u:
                    above_k, above_sz = blocks[j][0], blocks[j][1]
                    _swap_blocks_np(Tw, Zw, above_k, above_sz, psz, True)
                    blocks[j] = (above_k, psz)
                    blocks[j + 1] = (above_k + psz, above_sz)
                    j -= 1
                u += psz
                # re-derive blocks (standardization may have split 2x2s)
                blocks = block_starts(Tw)
                bi = len(blocks) - 1
        d = w - u
    # never deflate through the middle of a 2x2: block_starts guarantees
    # u is a block boundary
    spike_col = beta * Zw[0, :]
    T[k0:m, k0:m] = Tw
    T[:k0, k0:m] = T[:k0, k0:m] @ Zw
    if m < T.shape[0]:
        T[k0:m, m:] = Zw.T @ T[k0:m, m:]
    T[k0:m, k0 - 1] = spike_col
    if want_vecs:
        Z[:, k0:m] = Z[:, k0:m] @ Zw
    if d > 0:
        T[m - d:m, k0 - 1] = 0.0
    kept = w - d
    pairs = _shift_pairs_from_blocks(Tw, kept)
    if kept > 0:
        x = T[k0:m - d, k0 - 1].copy()
        v, tau = _house_real(x)
        if tau != 0.0:
            W = v @ T[k0:m - d, :]
            T[k0:m - d, :] -= tau * np.outer(v, W)
            W = T[:, k0:m - d] @ v
            T[:, k0:m - d] -= tau * np.outer(W, v)
            if want_vecs:
                W = Z[:, k0:m - d] @ v
                Z[:, k0:m - d] -= tau * np.outer(W, v)
        T[k0 + 1:m - d, k0 - 1] = 0.0
        _rehessenberg_real(T, Z, k0, m - d, want_vecs)
    return d, pairs


def hessenberg_qr_real_host(H: np.ndarray, want_vecs: bool,
                            max_sweeps_per_eig: int = 40,
                            use_aed: bool = True,
                            aed_window: Optional[int] = None
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Real Hessenberg QR: T = Z^T H Z with T quasi-upper-triangular
    (standardized 1x1/2x2 blocks) and Z orthogonal. Small problems run
    in the native C++ kernel (native/elx_hessqr_real.cpp); larger ones
    use real AED + real multibulge sweeps."""
    n = H.shape[0]
    if n <= _NATIVE_REAL_QR_CUTOFF:
        try:
            from ..native import hess_qr_real_native

            T, Z = hess_qr_real_native(H, want_vecs, max_sweeps_per_eig)
            return T, (Z if Z is not None else np.eye(n))
        except RuntimeError:
            pass
    if aed_window is None:
        aed_window = int(max(32, min(96, n // 6)))
    T = np.asarray(H, np.float64).copy()
    Z = np.eye(n)
    eps = np.finfo(np.float64).eps
    m = n
    its = 0
    window_its = 0
    total_budget = max_sweeps_per_eig * max(n, 1)
    while m > 0 and its < total_budget:
        if m == 1:
            break
        its += 1
        # deflate tiny subdiagonals
        deflated = False
        for k in range(m - 1, 0, -1):
            if abs(T[k, k - 1]) <= eps * (abs(T[k, k])
                                          + abs(T[k - 1, k - 1])):
                T[k, k - 1] = 0.0
                if k == m - 1:
                    m -= 1
                    deflated = True
                    window_its = 0
                break
        if deflated:
            continue
        if m == 1:
            break
        l = 0
        for k in range(m - 1, 0, -1):
            if T[k, k - 1] == 0.0:
                l = k
                break
        win = m - l
        if win == 1:
            m -= 1
            window_its = 0
            continue
        if win == 2:
            _standardize2x2_np(T, Z if want_vecs else None, l, want_vecs)
            m -= 2
            window_its = 0
            continue
        if win <= _NATIVE_REAL_QR_CUTOFF:
            # the whole active window fits the native kernel: solve it
            # there and apply the window similarity to the off-window
            # strips as GEMMs (avoids O(win) numpy Francis sweeps)
            try:
                from ..native import hess_qr_real_native

                Tw, Zw = hess_qr_real_native(T[l:m, l:m].copy(), True,
                                             max_sweeps_per_eig)
                T[l:m, l:m] = Tw
                if m < n:
                    T[l:m, m:] = Zw.T @ T[l:m, m:]
                if l > 0:
                    T[:l, l:m] = T[:l, l:m] @ Zw
                if want_vecs:
                    Z[:, l:m] = Z[:, l:m] @ Zw
                m = l
                window_its = 0
                continue
            except RuntimeError:
                pass
        if use_aed and win > 3 * aed_window and win > 48:
            w = min(aed_window, win - 1)
            d, pairs = _aed_real(T, Z, l, m, w, want_vecs, eps)
            if d > 0:
                m -= d
                continue
            npair = int(min(len(pairs), 32, max(2, win // 12)))
            _multibulge_sweep_real(T, Z, l, m, pairs[-npair:], want_vecs)
            its += max(npair, 1)
            continue
        window_its += 1
        if window_its % 11 == 0:
            s = abs(T[m - 1, m - 2]) + (
                abs(T[m - 2, m - 3]) if m - 2 > l else 0.0)
            ad = 0.75 * s + T[m - 1, m - 1]
            tr, det = 2.0 * ad, ad * ad - 0.4375 * s * s
        else:
            a, b = T[m - 2, m - 2], T[m - 2, m - 1]
            c, d_ = T[m - 1, m - 2], T[m - 1, m - 1]
            tr, det = a + d_, a * d_ - b * c
        _francis_sweep(T, Z, l, m, tr, det, want_vecs)
    # final cleanup: standardize every remaining 2x2, zero the dust
    k = 0
    while k < n - 1:
        if T[k + 1, k] != 0.0:
            _standardize2x2_np(T, Z if want_vecs else None, k, want_vecs)
            if T[k + 1, k] != 0.0:
                k += 2
                continue
        k += 1
    for i in range(2, n):
        T[i, :max(i - 1, 0)][np.abs(T[i, :max(i - 1, 0)]) > 0] = 0.0
    # zero any subdiagonal that is not part of a 2x2 block pattern
    return T, Z


def CheckRealSchur(U, standard_form: bool = False) -> None:
    """Validate a real quasi-triangular Schur form (reference:
    spectral/Schur/CheckReal.hpp): no adjacent nonzero subdiagonals;
    with ``standard_form``, each 2x2 block must have a constant
    diagonal and b*c < 0. Raises ValueError on violation (eager)."""
    Uh = np.asarray(U.global_array() if hasattr(U, "global_array") else U)
    if np.iscomplexobj(Uh):
        raise ValueError("CheckRealSchur called for complex matrix")
    n = Uh.shape[0]
    main = np.diagonal(Uh)
    sub = np.diagonal(Uh, -1)
    if standard_form and n > 1:
        sup = np.diagonal(Uh, 1)
        for j in range(n - 1):
            if sub[j] != 0 and main[j] != main[j + 1]:
                raise ValueError(
                    f"diagonal of 2x2 block not constant at j={j}")
            if sub[j] != 0 and sub[j] * sup[j] >= 0:
                raise ValueError(f"b*c >= 0 at j={j}")
    for j in range(n - 2):
        if sub[j] != 0 and sub[j + 1] != 0:
            raise ValueError(f"adjacent nonzero subdiagonals at j={j}")


def SchurRealToComplex(Tq, Zq=None):
    """Convert a real (standardized) quasi-triangular Schur form to the
    complex triangular form (reference: spectral/Schur/RealToComplex.hpp
    schur::RealToComplex), optionally rotating the Schur vectors too.

    Each standardized 2x2 block [[a, b], [c, a]] (bc < 0) is upper-
    triangularized by the analytic unitary V = [[b, i mu], [i mu, b]]/s
    with mu = sqrt(-bc), s = sqrt(b^2 + mu^2) — applied as one masked
    two-column and two-row transform per step of a fixed-trip fori_loop
    (identity where the subdiagonal is zero). Accepts DistMatrix or
    array; returns the same kind."""
    import jax
    import jax.numpy as jnp

    is_dm = hasattr(Tq, "global_array")
    if is_dm:
        from ..core.dmatrix import DistMatrix as _DM

        grid, wrap, m = Tq.grid, Tq.wrap, Tq.m
        # the sweep is a sequential small-block chain: run it on the
        # REPLICATED view (a sharded operand also tripped an XLA:CPU
        # SPMD miscompile of the dynamic col/row updates — wrong values,
        # not just wrong layout); the result is re-sharded on exit
        Td = Tq.replicated()
        Zd = Zq.replicated() if Zq is not None else None
    else:
        Td = jnp.asarray(Tq)
        Zd = jnp.asarray(Zq) if Zq is not None else None
        m = Td.shape[0]
    cdt = jnp.complex64 if Td.dtype == jnp.float32 else jnp.complex128
    T = Td.astype(cdt)
    Z = Zd.astype(cdt) if Zd is not None else None
    M = T.shape[0]

    def body(j, carry):
        T, Z = carry
        b = T[j, j + 1]
        c = T[j + 1, j]
        active = jnp.real(c) != 0
        mu = jnp.sqrt(jnp.maximum(-jnp.real(b) * jnp.real(c), 0.0))
        s = jnp.sqrt(jnp.real(b) ** 2 + mu ** 2)
        s = jnp.where(s == 0, 1.0, s)
        V = (jnp.asarray([[1, 0], [0, 1]], cdt) * jnp.real(b)
             + jnp.asarray([[0, 1], [1, 0]], cdt) * (1j * mu)) / s
        V = jnp.where(active, V, jnp.eye(2, dtype=cdt))
        cols = jax.lax.dynamic_slice(T, (0, j), (M, 2))
        T = jax.lax.dynamic_update_slice(T, cols @ V, (0, j))
        rows = jax.lax.dynamic_slice(T, (j, 0), (2, M))
        T = jax.lax.dynamic_update_slice(T, jnp.conj(V.T) @ rows, (j, 0))
        T = T.at[j + 1, j].set(jnp.zeros((), cdt))
        if Z is not None:
            zc = jax.lax.dynamic_slice(Z, (0, j), (M, 2))
            Z = jax.lax.dynamic_update_slice(Z, zc @ V, (0, j))
        return T, Z

    T, Z = jax.lax.fori_loop(0, max(m - 1, 0), body, (T, Z))
    if is_dm:
        Tdm = _DM.from_padded(T, Tq.m, Tq.n, *Tq.dist, grid, wrap)
        if Zq is None:
            return Tdm
        return Tdm, _DM.from_padded(Z, Zq.m, Zq.n, *Zq.dist, grid, wrap)
    return T if Zq is None else (T, Z)
