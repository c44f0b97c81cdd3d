"""El-style CLI argument registry.

Reference: the vendored 'choice' library (include/El/core/imports/
choice.hpp:69, mpi_choice.hpp:26) driving the Input<T>("--flag", "desc",
default) / ProcessInput() / PrintInputReport() pattern every test uses
(e.g. tests/blas_like/Gemm.cpp:314-322)."""

from __future__ import annotations

import sys
from typing import Any, Dict, List, Optional


class Args:
    """Singleton-ish argument registry (El::Args analogue)."""

    def __init__(self, argv: Optional[List[str]] = None):
        self.argv = list(sys.argv[1:] if argv is None else argv)
        self.requested: Dict[str, tuple] = {}
        self.values: Dict[str, Any] = {}

    def input(self, flag: str, description: str, default: Any) -> Any:
        self.requested[flag] = (description, default)
        val = default
        if flag in self.argv:
            idx = self.argv.index(flag)
            if isinstance(default, bool):
                val = True
            elif idx + 1 < len(self.argv):
                raw = self.argv[idx + 1]
                val = type(default)(raw)
        self.values[flag] = val
        return val

    def process(self, file=None) -> None:
        f = file or sys.stderr
        known = set(self.requested)
        i = 0
        while i < len(self.argv):
            tok = self.argv[i]
            if tok.startswith("--") and tok not in known:
                f.write(f"WARNING: unused argument {tok}\n")
            i += 1

    def print_report(self, file=None) -> None:
        f = file or sys.stdout
        f.write("Input arguments:\n")
        for flag, (desc, default) in self.requested.items():
            f.write(f"  {flag}: {self.values[flag]!r}  ({desc}; "
                    f"default {default!r})\n")


_default_args: Optional[Args] = None


def _args() -> Args:
    global _default_args
    if _default_args is None:
        _default_args = Args()
    return _default_args


def Input(flag: str, description: str, default):
    """Reference: El::Input<T>."""
    return _args().input(flag, description, default)


def ProcessInput() -> None:
    _args().process()


def PrintInputReport() -> None:
    _args().print_report()
