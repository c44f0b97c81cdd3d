"""Timer (reference: src/core/Timer.cpp — used ad hoc by every test
harness and HermitianEig's ctrl.timeStages)."""

from __future__ import annotations

import time
from typing import Optional

import jax


class Timer:
    """Wall-clock timer. ``stop`` synchronizes outstanding device work
    first (the SyncInfo-stream-sync the reference's GPU timers do)."""

    def __init__(self, name: str = ""):
        self.name = name
        self._start: Optional[float] = None
        self.total = 0.0
        self.count = 0

    def start(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def stop(self, sync: object = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        if self._start is None:
            raise RuntimeError("Timer.stop without start")
        dt = time.perf_counter() - self._start
        self.total += dt
        self.count += 1
        self._start = None
        return dt

    def partial(self) -> float:
        if self._start is None:
            return 0.0
        return time.perf_counter() - self._start

    def reset(self) -> None:
        self._start = None
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False

    def __repr__(self):
        return f"Timer({self.name!r}, total={self.total:.6f}s, n={self.count})"
