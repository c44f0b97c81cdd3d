"""level2 ops: Trmv / Trr / Trr2 / ApplyGivensSequence."""

import numpy as np

from elementalx import DistMatrix
from elementalx.core.types import LOWER, NORMAL, TRANSPOSE



def test_trmv_trr_trr2(grid, rng):
    """Trmv.cpp / Trr.cpp / Trr2.cpp."""
    from elementalx.blas import Trmv, Trr, Trr2
    from elementalx.core.types import NON_UNIT

    n = 10
    t = np.tril(rng.standard_normal((n, n))) + 3 * np.eye(n)
    x = rng.standard_normal((n, 1))
    T = DistMatrix.from_global(t, grid=grid)
    X = DistMatrix.from_global(x, grid=grid)
    np.testing.assert_allclose(
        np.asarray(Trmv(LOWER, NORMAL, NON_UNIT, T, X).global_array()),
        t @ x, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(Trmv(LOWER, TRANSPOSE, NON_UNIT, T, X).global_array()),
        t.T @ x, rtol=1e-12)
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(np.tril(a), grid=grid)
    y = rng.standard_normal((n, 1))
    got = np.asarray(Trr(LOWER, 1.5, DistMatrix.from_global(x, grid=grid),
                         DistMatrix.from_global(y, grid=grid),
                         A).global_array())
    np.testing.assert_allclose(got, np.tril(a) + np.tril(1.5 * x @ y.T),
                               rtol=1e-12, atol=1e-12)
    X2 = rng.standard_normal((n, 2))
    Y2 = rng.standard_normal((n, 2))
    got = np.asarray(Trr2(LOWER, 0.7,
                          DistMatrix.from_global(X2, grid=grid),
                          DistMatrix.from_global(Y2, grid=grid),
                          A).global_array())
    np.testing.assert_allclose(got, np.tril(a) + np.tril(0.7 * X2 @ Y2.T),
                               rtol=1e-12, atol=1e-12)


def test_apply_givens_sequence(grid, rng):
    """ApplyGivensSequence.cpp (lasr): all three sequence types, both
    sides and directions, vs an explicit rotation-by-rotation oracle."""
    from elementalx.blas import ApplyGivensSequence
    from elementalx.core.types import LEFT, RIGHT

    m = 6
    cth = np.cos(rng.standard_normal(m - 1))
    sth = np.sin(rng.standard_normal(m - 1))

    def oracle(a, side, st, fwd):
        ref = a.copy()
        n_ = ref.shape[0] if side == "l" else ref.shape[1]
        order = range(n_ - 1) if fwd else range(n_ - 2, -1, -1)
        for k in order:
            if st == "variable":
                p, q, i = k, k + 1, k
            elif st == "top":
                p, q, i = 0, k + 1, k
            else:
                p, q, i = k, n_ - 1, k
            if side == "l":
                rp, rq = ref[p].copy(), ref[q].copy()
                ref[p] = sth[i] * rq + cth[i] * rp
                ref[q] = cth[i] * rq - sth[i] * rp
            else:
                rp, rq = ref[:, p].copy(), ref[:, q].copy()
                ref[:, p] = sth[i] * rq + cth[i] * rp
                ref[:, q] = cth[i] * rq - sth[i] * rp
        return ref

    a = rng.standard_normal((m, 5))
    a2 = rng.standard_normal((4, m))
    for st in ("variable", "top", "bottom"):
        for direction, fwd in (("forward", True), ("backward", False)):
            got = np.asarray(ApplyGivensSequence(
                LEFT, st, direction, cth, sth,
                DistMatrix.from_global(a, grid=grid)).global_array())
            # 'top' backward visits i = m-1..1 — same pair set, reversed
            ref = oracle(a, "l", st, fwd)
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
            got = np.asarray(ApplyGivensSequence(
                RIGHT, st, direction, cth, sth,
                DistMatrix.from_global(a2, grid=grid)).global_array())
            ref = oracle(a2, "r", st, fwd)
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
