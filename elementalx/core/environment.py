"""Runtime environment: blocksize stack, exceptions, output helpers.

Reference: src/core/environment.cpp:114-360, include/El/core/environment/decl.hpp.

There is no Initialize/Finalize MPI bring-up to replicate: JAX owns device
discovery and the single controller process drives every chip. ``Initialize``
is kept as a no-op-ish hook that sets the default grid, for API parity.
"""

from __future__ import annotations

import contextlib
import sys
from typing import List


# ---------------------------------------------------------------------------
# Exceptions (reference: include/El/core/environment/decl.hpp:209-247)
# ---------------------------------------------------------------------------


class ElError(RuntimeError):
    pass


class LogicError(ElError):
    pass


class SingularMatrixException(ElError):
    """Reference: environment/decl.hpp:209."""

    def __init__(self, msg: str = "Matrix was singular"):
        super().__init__(msg)


class NonHPDMatrixException(ElError):
    """Reference: environment/decl.hpp:226 (thrown by unblocked Cholesky)."""

    def __init__(self, msg: str = "Matrix was not numerically HPD"):
        super().__init__(msg)


class NonHPSDMatrixException(ElError):
    def __init__(self, msg: str = "Matrix was not numerically HPSD"):
        super().__init__(msg)


# ---------------------------------------------------------------------------
# Algorithmic blocksize stack (reference: src/blas_like/blocksizes.cpp:16-60;
# default 128 pushed at Initialize, environment.cpp:312-313)
# ---------------------------------------------------------------------------

_blocksize_stack: List[int] = [128]


def Blocksize() -> int:
    return _blocksize_stack[-1]


def SetBlocksize(nb: int) -> None:
    _blocksize_stack[-1] = int(nb)


def PushBlocksizeStack(nb: int) -> None:
    _blocksize_stack.append(int(nb))


def PopBlocksizeStack() -> None:
    if len(_blocksize_stack) <= 1:
        raise LogicError("Attempted to pop the base of the blocksize stack")
    _blocksize_stack.pop()


@contextlib.contextmanager
def blocksize(nb: int):
    """Scoped blocksize override (pythonic form of Push/PopBlocksizeStack)."""
    PushBlocksizeStack(nb)
    try:
        yield
    finally:
        PopBlocksizeStack()


# ---------------------------------------------------------------------------
# Initialize / Finalize (reference: src/core/environment.cpp:209-330)
# ---------------------------------------------------------------------------

_initialized = False


def Initialize(argv=None) -> None:
    """Bring-up hook: establishes the default grid. JAX handles device
    init; kept for El-API parity (reference: environment.cpp:209)."""
    global _initialized
    if _initialized:
        return
    from .grid import Grid

    Grid.default()  # builds the default mesh over all devices
    _initialized = True


def Finalize() -> None:
    global _initialized
    from .grid import Grid

    Grid.set_default(None)
    _initialized = False


def Initialized() -> bool:
    return _initialized


# ---------------------------------------------------------------------------
# Opt-in debug checks (reference: EL_DEBUG_ONLY / EL_RELEASE entrywise
# bounds assertions, include/El/core/Matrix + DistMatrix CheckBounds).
# Off by default — the hot path stays assertion-free like the
# reference's release build; enable for debugging with
# EnableDebugChecks() or the debug_checks() context manager.
# ---------------------------------------------------------------------------

_debug_checks = False


def EnableDebugChecks(on: bool = True) -> None:
    global _debug_checks
    _debug_checks = bool(on)


def DebugChecksEnabled() -> bool:
    return _debug_checks


@contextlib.contextmanager
def debug_checks(on: bool = True):
    global _debug_checks
    prev = _debug_checks
    _debug_checks = bool(on)
    try:
        yield
    finally:
        _debug_checks = prev


def AssertInBounds(i, j, m: int, n: int, what: str = "entry") -> None:
    """Entrywise bounds assertion (only meaningful for host indices —
    traced index values are skipped, matching the reference's
    device-side unchecked access)."""
    if not isinstance(i, int) or not isinstance(j, int):
        return
    if not (0 <= i < m and 0 <= j < n):
        raise IndexError(
            f"{what} ({i}, {j}) out of bounds for {m} x {n} matrix")


# ---------------------------------------------------------------------------
# Output helpers (reference: Output/OutputFromRoot, src/core/indent.cpp)
# ---------------------------------------------------------------------------

_indent_level = 0


def PushIndent() -> None:
    global _indent_level
    _indent_level += 1


def PopIndent() -> None:
    global _indent_level
    _indent_level = max(0, _indent_level - 1)


def Indent() -> str:
    return "  " * _indent_level


def Output(*args, file=None) -> None:
    print(Indent() + " ".join(str(a) for a in args), file=file or sys.stdout)


def OutputFromRoot(*args, file=None) -> None:
    # single-controller: the controller *is* the root.
    Output(*args, file=file)
