"""Checkpoint/restore of distributed matrices.

The reference has no checkpointing (SURVEY §5: persistence = matrix file
IO only); the idiomatic TPU equivalent is sharded-array checkpointing.
Uses orbax when importable (async, sharding-preserving), else an npz +
JSON fallback — both restore onto the requested grid/distribution."""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..core.dmatrix import DistMatrix
from ..core.grid import Grid
from ..core.types import Dist, MC, MR


def SaveMatrix(A: DistMatrix, path: str) -> None:
    """Persist a DistMatrix (sharding-aware when orbax is present)."""
    meta = {
        "m": A.m,
        "n": A.n,
        "col_dist": int(A.col_dist),
        "row_dist": int(A.row_dist),
        "dtype": str(np.dtype(A.dtype)),
    }
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path) + ".orbax", A.data, force=True)
        ckptr.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump(dict(meta, backend="orbax"), f)
        return
    except Exception:
        pass
    np.savez(path + ".npz", data=np.asarray(A.replicated()))
    with open(path + ".meta.json", "w") as f:
        json.dump(dict(meta, backend="npz"), f)


def LoadMatrix(path: str, grid: Optional[Grid] = None) -> DistMatrix:
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    g = grid or Grid.default()
    col, row = Dist(meta["col_dist"]), Dist(meta["row_dist"])
    if meta.get("backend") == "orbax":
        try:
            import jax
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            sh = g.sharding(col, row)
            from ..core.dmatrix import padded_extent

            pm = padded_extent(meta["m"], g)
            pn = padded_extent(meta["n"], g)
            tgt = jax.ShapeDtypeStruct((pm, pn), np.dtype(meta["dtype"]),
                                       sharding=sh)
            data = ckptr.restore(os.path.abspath(path) + ".orbax", tgt)
            return DistMatrix(data, meta["m"], meta["n"], col, row, g)
        except Exception:
            pass
    arr = np.load(path + ".npz")["data"]
    return DistMatrix.from_padded(arr, meta["m"], meta["n"], col, row, g)
