"""BidiagSVD / Lanczos driver tests."""

import numpy as np
import jax.numpy as jnp

from elementalx.core.types import LOWER, UPPER



def test_bidiag_svd_driver(rng):
    """spectral.hpp BidiagSVD public driver (upper + lower, vectors)."""
    from elementalx.lapack import BidiagSVD

    n = 12
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    B = np.diag(d) + np.diag(e, 1)
    sref = np.linalg.svd(B, compute_uv=False)
    s = np.asarray(BidiagSVD(UPPER, jnp.asarray(d), jnp.asarray(e)))
    np.testing.assert_allclose(np.sort(s)[::-1], sref, atol=1e-10)
    U, s, V = BidiagSVD(UPPER, jnp.asarray(d), jnp.asarray(e),
                        vectors=True)
    rec = np.asarray(U) @ np.diag(np.asarray(s)) @ np.asarray(V).T
    assert np.linalg.norm(rec - B) / np.linalg.norm(B) < 1e-9
    Bl = np.diag(d) + np.diag(e, -1)
    Ul, sl, Vl = BidiagSVD(LOWER, jnp.asarray(d), jnp.asarray(e),
                           vectors=True)
    rec = np.asarray(Ul) @ np.diag(np.asarray(sl)) @ np.asarray(Vl).T
    assert np.linalg.norm(rec - Bl) / np.linalg.norm(Bl) < 1e-9


def test_lanczos_drivers(rng):
    """spectral/Lanczos.hpp + ProductLanczos.hpp: decomposition identity
    and extremal Ritz convergence."""
    from elementalx.lapack import LanczosDecomp, ProductLanczos

    m = 30
    a = rng.standard_normal((m, m))
    sA = a + a.T
    op = lambda x: jnp.asarray(sA) @ x  # noqa: E731
    V, T, v, beta = LanczosDecomp(m, op, 16)
    V = np.asarray(V)
    resid = sA @ V - V @ np.asarray(T)
    resid[:, -1] -= float(beta) * np.asarray(v)
    assert np.linalg.norm(resid) < 1e-9
    w = np.linalg.eigvalsh(sA)
    ritz = np.linalg.eigvalsh(np.asarray(T))
    assert abs(ritz[-1] - w[-1]) / abs(w[-1]) < 0.02
    g = rng.standard_normal((20, 8))
    opA = lambda x: jnp.asarray(g) @ x  # noqa: E731
    opAh = lambda x: jnp.asarray(g.T) @ x  # noqa: E731
    T2 = ProductLanczos(20, 8, opA, opAh, 8)
    smax = np.sqrt(np.linalg.eigvalsh(np.asarray(T2))[-1])
    assert abs(smax - np.linalg.norm(g, 2)) / np.linalg.norm(g, 2) < 0.02
