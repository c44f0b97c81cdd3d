"""Matrix I/O.

Reference: src/io/ — Print (ostream), Write/Read in ASCII /
ASCII_MATLAB / BINARY / BINARY_FLAT / MATRIX_MARKET (formats enum
include/El/core/types.hpp:510-526), Display/Spy (Qt5 widgets).

Here: the same five file formats plus NPY (the ecosystem-native format);
Display/Spy render via matplotlib when present (replacing Qt5), else
fall back to text. I/O stages through the host — it is setup/teardown
path, never the compute path."""

from __future__ import annotations

import enum
import io as _io
import os
import struct
import sys
from typing import Optional, TextIO

import numpy as np

from ..core.dmatrix import DistMatrix
from ..core.grid import Grid


class FileFormat(enum.IntEnum):
    """Reference: include/El/core/types.hpp:510-526."""

    AUTO = 0
    ASCII = 1
    ASCII_MATLAB = 2
    BINARY = 3
    BINARY_FLAT = 4
    MATRIX_MARKET = 5
    NPY = 6


_EXT = {
    ".txt": FileFormat.ASCII,
    ".m": FileFormat.ASCII_MATLAB,
    ".bin": FileFormat.BINARY,
    ".dat": FileFormat.BINARY_FLAT,
    ".mtx": FileFormat.MATRIX_MARKET,
    ".mm": FileFormat.MATRIX_MARKET,
    ".npy": FileFormat.NPY,
}


def _detect(path: str, fmt: FileFormat) -> FileFormat:
    if fmt != FileFormat.AUTO:
        return fmt
    return _EXT.get(os.path.splitext(path)[1].lower(), FileFormat.ASCII)


def Print(A: DistMatrix, title: str = "", file: Optional[TextIO] = None
          ) -> None:
    """Reference: src/io/Print.cpp."""
    f = file or sys.stdout
    if title:
        f.write(title + "\n")
    arr = A.global_array() if isinstance(A, DistMatrix) else np.asarray(A)
    for i in range(arr.shape[0]):
        f.write(" ".join(f"{v}" for v in arr[i]) + "\n")
    f.write("\n")


def Write(A: DistMatrix, path: str, fmt: FileFormat = FileFormat.AUTO,
          title: str = "") -> None:
    """Reference: src/io/Write/*.hpp."""
    fmt = _detect(path, fmt)
    arr = A.global_array() if isinstance(A, DistMatrix) else np.asarray(A)
    m, n = arr.shape
    if fmt == FileFormat.ASCII:
        with open(path, "w") as f:
            Print(A, title, f)
    elif fmt == FileFormat.ASCII_MATLAB:
        with open(path, "w") as f:
            name = title or "A"
            f.write(f"{name} = [\n")
            for i in range(m):
                f.write(" ".join(repr(v) for v in arr[i]) + ";\n")
            f.write("];\n")
    elif fmt == FileFormat.BINARY:
        with open(path, "wb") as f:
            f.write(struct.pack("<qq", m, n))
            f.write(np.ascontiguousarray(arr).tobytes())
    elif fmt == FileFormat.BINARY_FLAT:
        with open(path, "wb") as f:
            f.write(np.ascontiguousarray(arr).tobytes())
    elif fmt == FileFormat.MATRIX_MARKET:
        with open(path, "w") as f:
            field = "complex" if np.iscomplexobj(arr) else "real"
            f.write(f"%%MatrixMarket matrix array {field} general\n")
            if title:
                f.write(f"% {title}\n")
            f.write(f"{m} {n}\n")
            for j in range(n):
                for i in range(m):
                    v = arr[i, j]
                    if field == "complex":
                        f.write(f"{v.real:.17g} {v.imag:.17g}\n")
                    else:
                        f.write(f"{v:.17g}\n")
    elif fmt == FileFormat.NPY:
        np.save(path, arr)
    else:
        raise ValueError(fmt)


def Read(path: str, fmt: FileFormat = FileFormat.AUTO,
         grid: Optional[Grid] = None, dtype=np.float64) -> DistMatrix:
    """Reference: src/io/Read/*.hpp."""
    fmt = _detect(path, fmt)
    if fmt == FileFormat.ASCII:
        arr = np.loadtxt(path, dtype=dtype, ndmin=2)
    elif fmt == FileFormat.BINARY:
        with open(path, "rb") as f:
            m, n = struct.unpack("<qq", f.read(16))
            arr = np.frombuffer(f.read(), dtype=dtype).reshape(m, n)
    elif fmt == FileFormat.BINARY_FLAT:
        raise ValueError("BINARY_FLAT Read requires explicit dimensions; "
                         "use read_flat(path, m, n)")
    elif fmt == FileFormat.MATRIX_MARKET:
        arr = _read_matrix_market(path)
    elif fmt == FileFormat.NPY:
        arr = np.load(path)
    else:
        raise ValueError(fmt)
    return DistMatrix.from_global(arr, grid=grid)


def read_flat(path: str, m: int, n: int, grid: Optional[Grid] = None,
              dtype=np.float64) -> DistMatrix:
    arr = np.fromfile(path, dtype=dtype).reshape(m, n)
    return DistMatrix.from_global(arr, grid=grid)


def _read_matrix_market(path: str) -> np.ndarray:
    with open(path) as f:
        header = f.readline().split()
        if header[:2] != ["%%MatrixMarket", "matrix"]:
            raise ValueError("not a MatrixMarket file")
        layout, field = header[2], header[3]
        symmetric = len(header) > 4 and header[4] == "symmetric"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        m, n = int(dims[0]), int(dims[1])
        cplx = field == "complex"
        dt = np.complex128 if cplx else np.float64
        A = np.zeros((m, n), dt)
        if layout == "array":
            vals = []
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                vals.append(complex(float(parts[0]), float(parts[1]))
                            if cplx else float(parts[0]))
            A = np.asarray(vals, dt).reshape(n, m).T
        else:  # coordinate
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                i, j = int(parts[0]) - 1, int(parts[1]) - 1
                v = (complex(float(parts[2]), float(parts[3]))
                     if cplx else float(parts[2]))
                A[i, j] = v
                if symmetric and i != j:
                    A[j, i] = np.conj(v) if cplx else v
        return A


# -- colormap state (reference: src/io/ColorMap.cpp + Qt5 display config;
#    matplotlib-backed here) ---------------------------------------------

_COLOR_MAP = "viridis"
_NUM_DISCRETE_COLORS = 15


def SetColorMap(name: str) -> None:
    """Select the Display colormap (reference: io.hpp SetColorMap; any
    matplotlib colormap name)."""
    global _COLOR_MAP
    _COLOR_MAP = str(name)


def ColorMap() -> str:
    return _COLOR_MAP


def SetNumDiscreteColors(k: int) -> None:
    """Number of discretization chunks for discrete colormaps
    (reference: io.hpp SetNumDiscreteColors / ColorMap.cpp:18)."""
    global _NUM_DISCRETE_COLORS
    _NUM_DISCRETE_COLORS = int(k)


def NumDiscreteColors() -> int:
    return _NUM_DISCRETE_COLORS


def ProcessEvents(num_msecs: int = 0) -> None:
    """Pump GUI events (reference: io.hpp ProcessEvents — a Qt event
    loop tick). With matplotlib's interactive backends this is
    plt.pause; a no-op on Agg / without matplotlib."""
    try:
        import matplotlib
        import matplotlib.pyplot as plt

        if matplotlib.get_backend().lower() != "agg":
            plt.pause(max(num_msecs, 1) / 1000.0)
    except Exception:
        pass


def Display(A: DistMatrix, title: str = "", path: Optional[str] = None
            ) -> None:
    """Heatmap display (reference: src/io/Display.cpp:11-46, Qt5 ->
    matplotlib here; silently degrades to Print without matplotlib)."""
    arr = A.global_array() if isinstance(A, DistMatrix) else np.asarray(A)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        im = ax.imshow(np.real(arr), aspect="auto", cmap=_COLOR_MAP)
        fig.colorbar(im)
        ax.set_title(title)
        fig.savefig(path or (title or "display") + ".png")
        plt.close(fig)
    except ImportError:
        Print(A, title)


def Spy(A: DistMatrix, title: str = "", tol: float = 0.0,
        path: Optional[str] = None) -> None:
    """Sparsity plot (reference: src/io/Spy.cpp)."""
    arr = A.global_array() if isinstance(A, DistMatrix) else np.asarray(A)
    mask = np.abs(arr) > tol
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.spy(mask)
        ax.set_title(title)
        fig.savefig(path or (title or "spy") + ".png")
        plt.close(fig)
    except ImportError:
        for i in range(mask.shape[0]):
            print("".join("x" if v else "." for v in mask[i]))
