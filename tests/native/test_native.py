"""Native C++ component tests (skipped when no toolchain)."""

import numpy as np
import pytest

from elementalx import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_tridiag_eig_native(rng):
    n = 120
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    w, Z = native.tridiag_eig_native(d, e)
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    wref = np.linalg.eigvalsh(T)
    assert np.max(np.abs(np.sort(w) - wref)) < 1e-11
    assert np.linalg.norm(T @ Z - Z * w[None, :]) < 1e-11
    assert np.linalg.norm(np.eye(n) - Z.T @ Z) < 1e-11


@needs_native
def test_tridiag_eig_native_values_only(rng):
    n = 50
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    w, Z = native.tridiag_eig_native(d, e, want_vectors=False)
    assert Z is None
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    assert np.max(np.abs(np.sort(w) - np.linalg.eigvalsh(T))) < 1e-11


@needs_native
def test_tridiag_eig_via_driver(rng):
    import jax.numpy as jnp

    from elementalx.lapack.tridiag_eig import HermitianTridiagEig

    n = 40
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    w, Z = HermitianTridiagEig(jnp.asarray(d), jnp.asarray(e),
                               backend="native")
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    assert np.linalg.norm(T @ np.asarray(Z)
                          - np.asarray(Z) * np.asarray(w)[None, :]) < 1e-11


def test_amd_reduces_fill(rng):
    """Ordering quality: minimum-degree must beat the natural order on a
    2-D Laplacian (classic fill test)."""
    import scipy.sparse as sp
    from scipy.sparse import csgraph

    nx = 10
    n = nx * nx
    I = sp.eye(nx)
    T = sp.diags([1.0, 1.0], [-1, 1], (nx, nx))
    A = sp.csc_matrix(sp.kron(I, T) + sp.kron(T, I) + 4 * sp.eye(n))
    perm = native.amd_order(A.indptr, A.indices, n)
    assert sorted(perm.tolist()) == list(range(n))

    def fill(order):
        dense = np.abs(A.toarray())[np.ix_(order, order)] > 0
        L = np.zeros_like(dense)
        work = dense.copy()
        for k in range(n):
            below = work[k:, k]
            idx = np.where(below)[0] + k
            for a in range(len(idx)):
                for b in range(a + 1, len(idx)):
                    work[idx[b], idx[a]] = True
        return int(np.tril(work).sum())

    natural = fill(np.arange(n))
    ordered = fill(perm)
    assert ordered < natural
