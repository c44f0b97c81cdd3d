"""Numpy prototype of the two-stage successive band reduction (SBR)
tridiagonalization — math validation before the TPU implementation.

Stage 1: full symmetric -> band(b) via blocked Householder panels
  (compact WY, all-GEMM two-sided updates).
Stage 2: band(b) -> tridiagonal via rank-1 bulge chasing in the
  INTERLEAVED-GROUP order (groups of g columns chase together round by
  round), which makes each round's g staggered reflectors consecutive
  in creation order -> blockable as compact-WY diamonds for the
  backtransform.

Checks:
  1. stage-1 band structure + eigenvalue preservation
  2. stage-2 tridiagonal structure + eigenvalue preservation
  3. Q1/Q2 backtransform: A = Q T Q^T reconstruction
  4. WY-grouped (diamond) application of stage-2 reflectors matches
     the sequential rank-1 application

Run: python scratch/proto_sbr.py [n b g]
"""
import sys

import numpy as np


def house(x):
    """Householder v, tau (v[0]=1) s.t. (I - tau v v^T) x = (beta, 0...)."""
    x = x.astype(np.float64)
    n = x.shape[0]
    if n == 0:
        return x, 0.0, 0.0
    alpha = x[0]
    sigma2 = float(x[1:] @ x[1:])
    if sigma2 == 0.0:
        return np.concatenate([[1.0], x[1:]]), 0.0, alpha
    beta = -np.sign(alpha if alpha != 0 else 1.0) * np.hypot(alpha, np.sqrt(sigma2))
    v = x / (alpha - beta)
    v[0] = 1.0
    tau = (beta - alpha) / beta
    return v, tau, beta


def build_T(V, taus):
    """Forward-order compact WY: H_0 H_1 ... H_{r-1} = I - V T V^T."""
    r = V.shape[1]
    T = np.zeros((r, r))
    for i in range(r):
        T[i, i] = taus[i]
        if i:
            T[:i, i] = -taus[i] * (T[:i, :i] @ (V[:, :i].T @ V[:, i]))
    return T


# ---------------------------------------------------------------------------
# Stage 1: full -> band(b)
# ---------------------------------------------------------------------------

def band_reduce(A, b):
    """Return (A_band, panels) with panels = [(k, V, T)]: A_band =
    Q1^T A Q1, Q1 = prod_k (I - V_k T_k V_k^T) acting on rows k+b..n."""
    A = A.copy()
    n = A.shape[0]
    panels = []
    for k in range(0, n - b - 1, b):
        m = n - k - b              # rows below the diagonal block
        w = b                      # panel width (cols k..k+b always fit:
        #                            the loop bound gives k + b < n - 1)
        if m <= 1:
            break
        P = A[k + b:, k:k + w].copy()
        r = min(w, m)              # number of reflectors
        V = np.zeros((m, r))
        taus = np.zeros(r)
        R = P.copy()
        for i in range(r):
            v, tau, beta = house(R[i:, i])
            V[i:, i] = v
            taus[i] = tau
            R[i:, i:] -= tau * np.outer(v, v @ R[i:, i:])
        T = build_T(V, taus)
        # set the panel to [triu(R); 0]
        A[k + b:, k:k + w] = np.vstack([np.triu(R[:r, :]),
                                        np.zeros((m - r, w))])
        A[k:k + w, k + b:] = A[k + b:, k:k + w].T
        # two-sided update of the trailing block
        A2 = A[k + b:, k + b:]
        Y = A2 @ (V @ T)
        S = V.T @ Y
        W = Y - 0.5 * V @ (T.T @ S)
        A2 -= V @ W.T + W @ V.T
        A[k + b:, k + b:] = A2
        panels.append((k, V, T))
    return A, panels


def apply_q1(panels, Z, n, b):
    """Z := Q1 Z (reverse panel order)."""
    Z = Z.copy()
    for k, V, T in reversed(panels):
        Zs = Z[k + b:, :]
        Zs -= V @ (T @ (V.T @ Zs))
        Z[k + b:, :] = Zs
    return Z


# ---------------------------------------------------------------------------
# Stage 2: band(b) -> tridiag, interleaved-group rank-1 chasing
# ---------------------------------------------------------------------------

def band_to_tridiag(A, b):
    """Rank-1 bulge chasing in plain COLUMN-MAJOR order (sweep j fully
    chased before sweep j+1). Returns (A_tri, sweeps) with sweeps[j] =
    list of (r0, v, tau) in chase order s = 0, 1, ..."""
    A = A.copy()
    n = A.shape[0]
    sweeps = []
    for j in range(0, n - 2):
        ops = []
        s = 0
        while True:
            # elimination column and window for op (j, s)
            if s == 0:
                ce, r0 = j, j + 1
            else:
                ce, r0 = j + 1 + (s - 1) * b, j + 1 + s * b
            r1 = min(r0 + b, n)
            if r1 - r0 < 2 or ce >= n - 1:
                break
            x = A[r0:r1, ce].copy()
            v, tau, beta = house(x)
            # apply two-sided: rows/cols [r0, r1)
            A[r0:r1, :] -= tau * np.outer(v, v @ A[r0:r1, :])
            A[:, r0:r1] -= tau * np.outer(A[:, r0:r1] @ v, v)
            # numerical hygiene: enforce elimination exactly
            A[r0, ce] = beta
            A[ce, r0] = beta
            A[r0 + 1:r1, ce] = 0.0
            A[ce, r0 + 1:r1] = 0.0
            ops.append((r0, v, tau))
            s += 1
        sweeps.append(ops)
    return A, sweeps


def apply_q2_seq(sweeps, Z):
    """Z := Q2 Z by sequential rank-1s in reverse creation order."""
    Z = Z.copy()
    ops = [op for ops in sweeps for op in ops]
    for r0, v, tau in reversed(ops):
        r1 = r0 + v.shape[0]
        Z[r0:r1, :] -= tau * np.outer(v, v @ Z[r0:r1, :])
    return Z


def apply_q2_wy(sweeps, Z, g):
    """Z := Q2 Z with diamond WY blocks: group the same-chase-index
    reflectors of g CONSECUTIVE sweeps (windows staggered by 1).
    Application order: sweep-groups descending; within a group, chase
    index s ascending; within a block, sweeps descending (the order
    that reverse-creation reaches by commuting only disjoint pairs —
    the TPU backtransform plan)."""
    Z = Z.copy()
    n2 = len(sweeps)
    for c0 in reversed(range(0, n2, g)):
        grp = list(range(c0, min(c0 + g, n2)))
        smax = max((len(sweeps[j]) for j in grp), default=0)
        for s in range(smax):
            # apply-first = (j_hi, s); as one operator that is
            # H_{c0,s} ... H_{j_hi,s}, i.e. forward-WY columns in
            # ASCENDING sweep order
            members = [(j, *sweeps[j][s]) for j in grp
                       if s < len(sweeps[j])]
            if not members:
                continue
            base = min(r0 for _, r0, _, _ in members)
            top = max(r0 + v.shape[0] for _, r0, v, _ in members)
            m = top - base
            V = np.zeros((m, len(members)))
            taus = np.zeros(len(members))
            for i, (_, r0, v, tau) in enumerate(members):
                V[r0 - base:r0 - base + v.shape[0], i] = v
                taus[i] = tau
            T = build_T(V, taus)
            Zs = Z[base:top, :]
            Zs -= V @ (T @ (V.T @ Zs))
            Z[base:top, :] = Zs
    return Z


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    A0 = rng.standard_normal((n, n))
    A0 = (A0 + A0.T) / 2
    ev0 = np.linalg.eigvalsh(A0)

    # ---- stage 1
    Ab, panels = band_reduce(A0, b)
    band_err = 0.0
    for d in range(b + 1, n):
        band_err = max(band_err, np.max(np.abs(np.diag(Ab, -d))))
    ev1 = np.linalg.eigvalsh(Ab)
    print(f"stage1: out-of-band max {band_err:.2e}  "
          f"eig drift {np.max(np.abs(ev1 - ev0)):.2e}")
    Z = rng.standard_normal((n, 3))
    lhs = A0 @ apply_q1(panels, Z, n, b)
    rhs = apply_q1(panels, Ab @ Z, n, b)
    print(f"stage1: Q1 backtransform resid {np.max(np.abs(lhs - rhs)):.2e}")

    # ---- stage 2
    At, sweeps = band_to_tridiag(Ab, b)
    offtri = 0.0
    for d in range(2, n):
        offtri = max(offtri, np.max(np.abs(np.diag(At, -d))))
    ev2 = np.linalg.eigvalsh(At)
    print(f"stage2: off-tridiag max {offtri:.2e}  "
          f"eig drift {np.max(np.abs(ev2 - ev0)):.2e}")

    lhs = Ab @ apply_q2_seq(sweeps, Z)
    rhs = apply_q2_seq(sweeps, At @ Z)
    print(f"stage2: Q2 (seq) backtransform resid "
          f"{np.max(np.abs(lhs - rhs)):.2e}")

    zw = apply_q2_wy(sweeps, Z, g)
    zs = apply_q2_seq(sweeps, Z)
    print(f"stage2: WY-diamond vs seq {np.max(np.abs(zw - zs)):.2e}")

    # ---- full composition
    Zt = rng.standard_normal((n, 3))
    lhs = A0 @ apply_q1(panels, apply_q2_seq(sweeps, Zt), n, b)
    rhs = apply_q1(panels, apply_q2_seq(sweeps, At @ Zt), n, b)
    print(f"compose: A Q1 Q2 Z vs Q1 Q2 T Z resid "
          f"{np.max(np.abs(lhs - rhs)):.2e}")


if __name__ == "__main__":
    main()
