"""Auxiliary subsystems (SURVEY §5)."""

from .timer import Timer  # noqa: F401
from .profiling import (  # noqa: F401
    AUTO_PROFILE_REGION,
    BeginRegionProfile,
    EndRegionProfile,
    DisableProfiling,
    EnableProfiling,
    profile_region,
    start_trace,
    stop_trace,
)
from .args import Args, Input, ProcessInput, PrintInputReport  # noqa: F401
from .logging_ import CloseLog, LogAppend, OpenLog  # noqa: F401
from .checkpoint import LoadMatrix, SaveMatrix  # noqa: F401
