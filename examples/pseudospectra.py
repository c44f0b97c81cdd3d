"""Pseudospectral portrait example — the reference's flagship demo
(Pseudospectra.cpp snapshots): compute the resolvent-norm map of a
classic non-normal matrix (Grcar / bull's head) and render it with
io.Display's machinery."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the experimental axon TPU tunnel cannot transfer complex buffers
# (device<->host); pseudospectra is complex-valued end to end, so fall
# back to the CPU backend under that tunnel (XLA:TPU proper supports
# complex64 — this is a transport limitation, see CLAUDE.md). Decide
# BEFORE the backend initialises.
if os.environ.get("JAX_PLATFORMS", "").lower() == "axon" \
        or os.environ.get("PALLAS_AXON_TPU_GEN"):
    jax.config.update("jax_platforms", "cpu")

import elementalx as El
from elementalx import matrices as M
from elementalx.lapack.pseudospectra import (OneNormPseudospectra,
                                             Pseudospectra)
from elementalx.utils import Input, ProcessInput, Timer


def main():
    n = Input("--n", "matrix size", 64)
    res = Input("--res", "grid resolution", 40)
    which = Input("--matrix", "grcar|bullshead|foxli", "grcar")
    alg = Input("--alg", "power|lanczos|ira|onenorm", "power")
    auto = Input("--auto", "auto-box via SpectralPortrait (0/1)", 0)
    ProcessInput()
    grid = El.Grid()
    if which == "grcar":
        A = M.Grcar(n, grid=grid)
        bounds = ((-1.5, 3.5), (-3.5, 3.5))
    elif which == "bullshead":
        A = M.BullsHead(n, grid)
        bounds = ((-4.0, 4.0), (-4.0, 4.0))
    else:
        A = M.FoxLi(n, grid=grid)
        bounds = ((-1.5, 1.5), (-1.5, 1.5))
    with Timer("portrait") as t:
        if auto:
            from elementalx.lapack.pseudospectra import SpectralPortrait

            port = SpectralPortrait(A, real_size=res, imag_size=res,
                                    iters=30)
        elif alg == "onenorm":
            port = OneNormPseudospectra(A, bounds[0], bounds[1],
                                        real_size=res, imag_size=res,
                                        iters=10)
        else:
            port = Pseudospectra(A, bounds[0], bounds[1], real_size=res,
                                 imag_size=res, iters=30, alg=alg)
    print(f"portrait {res}x{res} ({alg}) in {t.total:.1f}s")
    logmap = np.log10(np.asarray(port.sigma_min_map))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        cs = ax.contourf(np.asarray(port.real_grid),
                         np.asarray(port.imag_grid), logmap, levels=20)
        fig.colorbar(cs, label="log10 sigma_min(A - zI)")
        ax.set_title(f"{which} pseudospectra (n={n})")
        out = f"pseudospectra_{which}.png"
        fig.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        print("matplotlib unavailable; min log10 sigma:", logmap.min())


if __name__ == "__main__":
    main()
