"""Region-based profiling.

Reference: src/core/Profiling.cpp:95-142 — BeginRegionProfile/
EndRegionProfile emit NVTX colored ranges / VTune ITT tasks; the
AUTO_PROFILE_REGION RAII macro annotates hot regions (e.g. "SUMMA.NNC",
src/blas_like/level3/Gemm/NN.hpp:331-334).

TPU equivalent: jax.profiler traces (viewable in TensorBoard/XProf) with
jax.named_scope carrying the same region names into the compiled HLO,
plus the runtime enable/disable switch of the reference."""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

_enabled = True


def EnableProfiling() -> None:
    """Reference: Profiling.cpp:62-90 runtime toggle."""
    global _enabled
    _enabled = True


def DisableProfiling() -> None:
    global _enabled
    _enabled = False


def ProfilingEnabled() -> bool:
    return _enabled


class _Region:
    def __init__(self, name: str):
        self.name = name
        self._scope = None

    def __enter__(self):
        if _enabled:
            self._scope = jax.named_scope(self.name)
            self._scope.__enter__()
        return self

    def __exit__(self, *exc):
        if self._scope is not None:
            self._scope.__exit__(*exc)
            self._scope = None
        return False


def AUTO_PROFILE_REGION(name: str) -> _Region:
    """RAII region annotation (use as a context manager)."""
    return _Region(name)


profile_region = AUTO_PROFILE_REGION

_open_regions = []


def BeginRegionProfile(name: str, color=None) -> None:
    """Reference: Profiling.cpp BeginRegionProfile (color ignored — XProf
    assigns its own)."""
    r = _Region(name)
    r.__enter__()
    _open_regions.append(r)


def EndRegionProfile(name: Optional[str] = None) -> None:
    if _open_regions:
        _open_regions.pop().__exit__(None, None, None)


def start_trace(logdir: str) -> None:
    """Capture a device trace (the NVTX-timeline analogue)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
