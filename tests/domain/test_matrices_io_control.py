"""Matrix generators, IO round-trips, control solvers."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx import matrices as M
from elementalx import io_ as io
from elementalx.io_ import FileFormat


def test_classical_generators(grid):
    n = 8
    assert np.allclose(M.Identity(n, grid).global_array(), np.eye(n))
    assert np.allclose(M.Ones(5, 3, grid).global_array(), np.ones((5, 3)))
    assert np.allclose(M.Zeros(4, 4, grid).global_array(), 0)
    h = M.Hilbert(n, grid).global_array()
    assert np.allclose(h, 1.0 / (np.add.outer(np.arange(n),
                                              np.arange(n)) + 1))
    c = np.arange(1.0, 7.0)
    circ = M.Circulant(c, grid).global_array()
    for i in range(6):
        for j in range(6):
            assert circ[i, j] == c[(i - j) % 6]
    F = M.Fourier(8, grid).global_array()
    assert np.linalg.norm(F @ F.conj().T - np.eye(8)) < 1e-12
    J = M.Jordan(5, 2.5, grid).global_array()
    assert np.allclose(J, 2.5 * np.eye(5) + np.diag(np.ones(4), 1))
    W = M.Walsh(3, grid=grid).global_array()
    assert np.linalg.norm(W @ W.T - 8 * np.eye(8)) < 1e-12
    lehmer = M.Lehmer(6, grid).global_array()
    assert np.allclose(lehmer, lehmer.T)
    assert np.allclose(np.diag(lehmer), 1.0)
    minij = M.MinIJ(5, grid).global_array()
    assert minij[3, 4] == 4.0
    KMS = M.KMS(6, 0.5, grid).global_array()
    assert KMS[0, 5] == 0.5 ** 5
    wil = M.Wilkinson(3, grid).global_array()
    assert wil.shape == (7, 7) and wil[0, 0] == 3.0
    gcd = M.GCDMatrix(6, 6, grid).global_array()
    assert gcd[3, 5] == 2.0
    to = M.Toeplitz(4, 4, np.arange(7.0), grid).global_array()
    assert to[0, 0] == 3.0 and to[3, 0] == 6.0 and to[0, 3] == 0.0


def test_misc_generators(grid):
    n = 8
    kahan = M.Kahan(n, 0.5, grid).global_array()
    assert np.allclose(kahan, np.triu(kahan))
    pei = M.Pei(n, 3.0, grid).global_array()
    assert np.allclose(pei, np.ones((n, n)) + 3.0 * np.eye(n))
    lau = M.Lauchli(4, 0.1, grid).global_array()
    assert lau.shape == (5, 4)
    red = M.Redheffer(6, grid).global_array()
    assert red[0, 0] == 1 and red[1, 3] == 1 and red[1, 2] == 0
    grc = M.Grcar(7, grid=grid).global_array()
    assert grc[1, 0] == -1.0 and grc[0, 3] == 1.0
    parter = M.Parter(5, grid).global_array()
    assert abs(parter[0, 0] - 2.0) < 1e-14
    leg = M.Legendre(6, grid).global_array()
    w = np.linalg.eigvalsh(leg)
    assert np.all(np.abs(w) < 1.0)  # Gauss-Legendre nodes
    rif = M.Riffle(6, grid).global_array()
    assert np.allclose(rif.sum(axis=1), 1.0, atol=1e-12)  # stochastic
    ehr = M.Ehrenfest(5, grid).global_array()
    assert np.allclose(ehr.sum(axis=1), 1.0)
    tri = M.TriW(6, 2.0, 2, grid).global_array()
    assert tri[0, 1] == 2.0 and tri[0, 3] == 0.0
    gepp = M.GEPPGrowth(5, grid).global_array()
    assert gepp[4, 4] == 1.0 and gepp[1, 4] == 1.0 and gepp[2, 0] == -1.0


def test_pde_integral_generators(grid):
    L = M.Laplacian(3, 3, grid).global_array()
    assert L.shape == (9, 9)
    assert np.allclose(L, L.T)
    assert np.allclose(np.diag(L), -4.0)
    H = M.Helmholtz(5, 1.0, grid=grid).global_array()
    assert np.allclose(np.diag(H), 2.0 - 1.0)
    F = M.FoxLi(12).global_array()
    assert F.shape == (12, 12) and np.iscomplexobj(F)


def test_random_generators(grid):
    El.SeedRandom(3)
    U = M.Uniform(64, 64, grid).global_array()
    assert -1.0 <= U.min() and U.max() <= 1.0
    G = M.Gaussian(200, 100, grid).global_array()
    assert abs(G.mean()) < 0.05 and abs(G.std() - 1.0) < 0.05
    R = M.Rademacher(32, 32, grid).global_array()
    assert set(np.unique(R)) <= {-1.0, 1.0}
    B = M.Bernoulli(32, 32, 0.5, grid).global_array()
    assert set(np.unique(B)) <= {0.0, 1.0}
    T = M.ThreeValued(32, 32, grid=grid).global_array()
    assert set(np.unique(T)) <= {-1.0, 0.0, 1.0}
    W = M.Wigner(24, grid).global_array()
    assert np.allclose(W, W.T)
    Q = M.Haar(16, grid).global_array()
    assert np.linalg.norm(Q @ Q.T - np.eye(16)) < 1e-12
    S = M.HermitianUniformSpectrum(12, 1.0, 2.0, grid).global_array()
    w = np.linalg.eigvalsh(S)
    assert w.min() >= 0.99 and w.max() <= 2.01
    HN = M.HatanoNelson(10, 0.5, grid).global_array()
    assert abs(HN[0, 9] - np.exp(-0.5)) < 1e-12


@pytest.mark.parametrize("fmt,ext", [
    (FileFormat.ASCII, ".txt"),
    (FileFormat.BINARY, ".bin"),
    (FileFormat.MATRIX_MARKET, ".mtx"),
    (FileFormat.NPY, ".npy"),
])
def test_io_roundtrip(grid, rng, tmp_path, fmt, ext):
    a = rng.standard_normal((7, 5))
    A = DistMatrix.from_global(a, grid=grid)
    p = str(tmp_path / f"mat{ext}")
    io.Write(A, p, fmt)
    B = io.Read(p, fmt, grid=grid)
    np.testing.assert_allclose(B.global_array(), a, atol=1e-15)


def test_io_flat_and_matlab(grid, rng, tmp_path):
    a = rng.standard_normal((6, 4))
    A = DistMatrix.from_global(a, grid=grid)
    p = str(tmp_path / "m.dat")
    io.Write(A, p, FileFormat.BINARY_FLAT)
    B = io.read_flat(p, 6, 4, grid=grid)
    np.testing.assert_allclose(B.global_array(), a)
    io.Write(A, str(tmp_path / "m.m"), FileFormat.ASCII_MATLAB, title="X")
    text = (tmp_path / "m.m").read_text()
    assert text.startswith("X = [")


def test_mm_coordinate_symmetric(grid, tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("""%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 2 0.5
3 3 4.0
""")
    A = io.Read(str(p), grid=grid).global_array()
    assert A[0, 1] == -1.0 and A[1, 0] == -1.0 and A[1, 2] == 0.5


def test_sylvester_lyapunov(grid, rng):
    from elementalx.control import Lyapunov, Sylvester

    m, n = 8, 6
    a = rng.standard_normal((m, m)) + m * np.eye(m)  # spectra in RHP
    b = rng.standard_normal((n, n)) + n * np.eye(n)
    c = rng.standard_normal((m, n))
    X = Sylvester(DistMatrix.from_global(a, grid=grid),
                  DistMatrix.from_global(b, grid=grid),
                  DistMatrix.from_global(c, grid=grid)).global_array()
    assert np.linalg.norm(a @ X + X @ b - c) / np.linalg.norm(c) < 1e-8
    cs = c[:, :] if m == n else rng.standard_normal((m, m))
    cs = cs + cs.T
    XL = Lyapunov(DistMatrix.from_global(a, grid=grid),
                  DistMatrix.from_global(cs, grid=grid)).global_array()
    assert np.linalg.norm(a @ XL + XL @ a.T - cs) / np.linalg.norm(cs) < 1e-8


def test_riccati(grid, rng):
    from elementalx.control import Riccati

    n = 6
    a = -(rng.standard_normal((n, n)) * 0.3 + n * np.eye(n))  # stable A
    q = rng.standard_normal((n, n))
    q = q @ q.T + np.eye(n)
    ell = rng.standard_normal((n, n))
    ell = ell @ ell.T * 0.1
    A = DistMatrix.from_global(a, grid=grid)
    X = Riccati(A, DistMatrix.from_global(q, grid=grid),
                DistMatrix.from_global(ell, grid=grid)).global_array()
    # CARE residual: A^H X + X A - X L X + Q = 0
    res = a.T @ X + X @ a - X @ ell @ X + q
    assert np.linalg.norm(res) / np.linalg.norm(q) < 1e-6


def test_lattice_bases(grid):
    """Lattice basis generators (reference:
    src/matrices/random/lattice/{AjtaiTypeBasis,KnapsackTypeBasis}.cpp)."""
    import jax

    A = M.AjtaiTypeBasis(6, 0.5, grid, key=jax.random.key(3))
    a = A.global_array()
    d = np.round(np.exp2((2 * 6 - np.arange(6) + 1.0) ** 0.5))
    assert np.allclose(np.tril(a, -1), 0)
    assert np.allclose(np.diag(a), d)
    up = np.triu(a, 1)
    assert np.all(up >= 0) and np.all(up <= (d / 2)[None, :])
    assert np.allclose(up, np.round(up))  # integer entries

    B = M.KnapsackTypeBasis(5, 50.0, grid, key=jax.random.key(4))
    b = B.global_array()
    assert b.shape == (6, 5)
    assert np.allclose(b[:5], np.eye(5))
    assert np.all(np.abs(b[5]) <= 50.0)
    assert np.allclose(b[5], np.round(b[5]))



def test_markov_chain_generators(grid):
    """misc/Ehrenfest.cpp + misc/Riffle.cpp: the Stationary generators
    are exact left fixed points of the transition matrices; Decay =
    transition - stationary."""
    from elementalx import matrices as M

    n = 10
    P = np.asarray(M.Ehrenfest(n, grid=grid).global_array())
    S = np.asarray(M.EhrenfestStationary(n, grid=grid).global_array())
    np.testing.assert_allclose(S.sum(axis=1), 1.0, rtol=1e-13)
    np.testing.assert_allclose(S[0] @ P, S[0], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(M.EhrenfestDecay(n, grid=grid).global_array()), P - S,
        atol=1e-13)
    Pr = np.asarray(M.Riffle(n, grid=grid).global_array())
    Sr = np.asarray(M.RiffleStationary(n, grid=grid).global_array())
    np.testing.assert_allclose(Sr.sum(axis=1), 1.0, rtol=1e-13)
    np.testing.assert_allclose(Sr[0] @ Pr, Sr[0], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(M.RiffleDecay(n, grid=grid).global_array()), Pr - Sr,
        atol=1e-13)
