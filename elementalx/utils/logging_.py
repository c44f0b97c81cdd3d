"""Log-file utilities (reference: src/core/logging.cpp:21-40 —
rank-tagged OpenLog/LogAppend; single-controller here, so one file)."""

from __future__ import annotations

import sys
from typing import Optional, TextIO

_log: Optional[TextIO] = None


def OpenLog(path: str) -> None:
    global _log
    CloseLog()
    _log = open(path, "a")


def LogAppend(*args) -> None:
    target = _log or sys.stderr
    target.write(" ".join(str(a) for a in args) + "\n")
    target.flush()


def CloseLog() -> None:
    global _log
    if _log is not None:
        _log.close()
        _log = None
