"""Image (range) and kernel (nullspace) bases.

Reference: src/lapack_like/spectral/ImageAndKernel.cpp (SVD-based)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, pad_array
from ..core.types import MC, MR


def ImageAndKernel(A: DistMatrix, tol: Optional[float] = None
                   ) -> Tuple[DistMatrix, DistMatrix]:
    """(orthonormal basis of range(A), orthonormal basis of null(A))
    via the SVD (reference: ImageAndKernel.cpp)."""
    from .svd import SVD

    m, n = A.m, A.n
    U, s, V = SVD(A)
    eps = jnp.finfo(jnp.real(A.data).dtype).eps
    cutoff = (tol if tol is not None else max(m, n) * float(eps)) * float(s[0])
    rank = int(jnp.sum(s > cutoff))
    img = U.data[:m, :rank]
    # kernel: columns of a FULL right singular basis beyond the rank. The
    # thin V only has min(m,n) columns; complete it via the nullspace of
    # the projector when n > that.
    Vd = V.data[:n, : min(m, n)]
    if rank < Vd.shape[1]:
        ker = Vd[:, rank:]
    else:
        ker = jnp.zeros((n, 0), Vd.dtype)
    if n > min(m, n):
        # complete the basis: null(A) also contains the orthogonal
        # complement of the thin V columns
        import numpy as np

        q, _ = np.linalg.qr(np.asarray(Vd), mode="complete")
        extra = jnp.asarray(q[:, min(m, n):])
        ker = jnp.concatenate([ker, extra.astype(Vd.dtype)], axis=1)
    Img = DistMatrix.from_global(img, MC, MR, A.grid)
    Ker = DistMatrix.from_global(ker, MC, MR, A.grid)
    return Img, Ker


def Image(A: DistMatrix, tol: Optional[float] = None) -> DistMatrix:
    return ImageAndKernel(A, tol)[0]


def Kernel(A: DistMatrix, tol: Optional[float] = None) -> DistMatrix:
    return ImageAndKernel(A, tol)[1]
