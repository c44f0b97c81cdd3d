"""MPS linear-program reader.

Reference: the .mps instances shipped in data/optimization/ (afiro,
adlittle, share1b, share2b) that upstream Elemental's Python examples
solved. Parses the classic fixed/free MPS subset (ROWS N/L/G/E, COLUMNS,
RHS, RANGES ignored, BOUNDS LO/UP/FX/MI basic) and converts to standard
form min c^T x, A x = b, x >= 0 by adding slacks and shifting bounds."""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import numpy as np


class MPSProblem(NamedTuple):
    A: np.ndarray
    b: np.ndarray
    c: np.ndarray
    name: str
    col_names: List[str]
    objective_shift: float


def read_mps(path: str) -> MPSProblem:
    name = ""
    section = ""
    row_type: Dict[str, str] = {}
    row_order: List[str] = []
    obj_row = None
    cols: Dict[str, Dict[str, float]] = {}
    col_order: List[str] = []
    rhs: Dict[str, float] = {}
    lower: Dict[str, float] = {}
    upper: Dict[str, float] = {}
    fixed: Dict[str, float] = {}
    free: Dict[str, bool] = {}

    with open(path) as f:
        for raw in f:
            if not raw.strip() or raw.startswith("*"):
                continue
            if not raw[0].isspace():
                parts = raw.split()
                section = parts[0].upper()
                if section == "NAME":
                    name = parts[1] if len(parts) > 1 else ""
                if section == "ENDATA":
                    break
                continue
            parts = raw.split()
            if section == "ROWS":
                t, rname = parts[0].upper(), parts[1]
                if t == "N":
                    if obj_row is None:
                        obj_row = rname
                else:
                    row_type[rname] = t
                    row_order.append(rname)
            elif section == "COLUMNS":
                if len(parts) >= 3 and parts[1].upper() == "'MARKER'":
                    continue  # integer markers ignored (LP relaxation)
                cname = parts[0]
                if cname not in cols:
                    cols[cname] = {}
                    col_order.append(cname)
                for k in range(1, len(parts) - 1, 2):
                    cols[cname][parts[k]] = float(parts[k + 1])
            elif section == "RHS":
                for k in range(1, len(parts) - 1, 2):
                    rhs[parts[k]] = float(parts[k + 1])
            elif section == "BOUNDS":
                btype = parts[0].upper()
                cname = parts[2]
                val = float(parts[3]) if len(parts) > 3 else 0.0
                if btype == "LO":
                    lower[cname] = val
                elif btype == "UP":
                    upper[cname] = val
                elif btype == "FX":
                    fixed[cname] = val
                elif btype == "MI":
                    free[cname] = True
                elif btype == "FR":
                    free[cname] = True

    n0 = len(col_order)
    m0 = len(row_order)
    ridx = {r: i for i, r in enumerate(row_order)}
    A0 = np.zeros((m0, n0))
    c0 = np.zeros(n0)
    for j, cname in enumerate(col_order):
        for rname, v in cols[cname].items():
            if rname == obj_row:
                c0[j] = v
            elif rname in ridx:
                A0[ridx[rname], j] = v
    b0 = np.zeros(m0)
    for rname, v in rhs.items():
        if rname in ridx:
            b0[ridx[rname]] = v

    # variable transforms: x = x' + lo (x' >= 0); FX pins; FR/MI split
    shift = 0.0
    split_cols = []
    for j, cname in enumerate(col_order):
        lo = fixed.get(cname, lower.get(cname, 0.0))
        if lo != 0.0:
            b0 -= A0[:, j] * lo
            shift += c0[j] * lo
        if cname in fixed:
            upper[cname] = 0.0  # x' == 0
        elif cname in free:
            split_cols.append(j)
        if cname in upper and cname not in fixed:
            upper[cname] = upper[cname] - lo
    # free variables: x' = u - v with u, v >= 0
    if split_cols:
        A0 = np.concatenate([A0, -A0[:, split_cols]], axis=1)
        c0 = np.concatenate([c0, -c0[split_cols]])
        for j in split_cols:
            col_order.append(col_order[j] + "_neg")

    # inequality rows -> slacks; upper bounds -> extra rows with slacks
    slack_rows = [i for i, r in enumerate(row_order)
                  if row_type[r] in ("L", "G")]
    ub_cols = [(col_order.index(cn), ub) for cn, ub in upper.items()
               if cn in col_order and cn not in fixed]
    n1 = A0.shape[1]
    m1 = m0 + len(ub_cols)
    ns = len(slack_rows) + len(ub_cols)
    A = np.zeros((m1, n1 + ns))
    A[:m0, :n1] = A0
    b = np.zeros(m1)
    b[:m0] = b0
    c = np.concatenate([c0, np.zeros(ns)])
    s = n1
    for i in slack_rows:
        A[i, s] = 1.0 if row_type[row_order[i]] == "L" else -1.0
        s += 1
    for k, (j, ub) in enumerate(ub_cols):
        A[m0 + k, j] = 1.0
        A[m0 + k, s] = 1.0
        b[m0 + k] = ub
        s += 1
    # fixed columns x' == 0: drop by zeroing their cost/usage via bound row
    for cname in fixed:
        if cname in col_order:
            j = col_order.index(cname)
            # x'_j = 0 enforced: remove the column
            A[:, j] = 0.0
            c[j] = 0.0
    return MPSProblem(A, b, c, name, col_order, shift)
