"""Shared on-chip timing helper for the axon tunnel (see CLAUDE.md):
time k1- and k2-iteration chained jit programs, divide the difference.
Pass operands as jit ARGUMENTS (closure capture would embed them as
constants and blow up the remote-compile payload). Run from the repo
root (axon plugin discovery breaks under PYTHONPATH)."""

import time


def chain_time(make_chain, args, k1=2, k2=22, reps=3):
    """make_chain(k) -> jitted callable over *args returning a scalar;
    returns seconds per iteration."""
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
