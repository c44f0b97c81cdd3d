"""Verify probe: changed paths through the public API (CPU backend)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", None)
import numpy as np
import jax.numpy as jnp
import elementalx as El
from elementalx.core.types import LEFT, LOWER, UPPER, NORMAL, MC, MR

g = El.Grid(jax.devices()[:1], 1)
rng = np.random.default_rng(0)
eps = np.finfo(np.float64).eps

# 1. TriangEig through Schur on a random matrix
n = 96
A = rng.standard_normal((n, n))
Adm = El.DistMatrix.from_global(jnp.asarray(A + 0j), MC, MR, g)
dec = El.lapack.Schur(Adm, want_vecs=True)
T = dec.T
X = El.lapack.TriangEig(T)
Tg = np.asarray(T.global_array())
Xg = np.asarray(X.global_array())
lam = np.diagonal(Tg)
R = Tg @ Xg - Xg * lam[None, :]
r = np.abs(R).max() / (eps * n * max(1, np.abs(Tg).max()))
print(f"TriangEig scaled resid {r:.3f} {'PASS' if r < 100 else 'FAIL'}")

# 2. MultiShiftTrsm vs dense solves
m, k = 80, 11
Tm = np.triu(rng.standard_normal((m, m))) + 4 * np.eye(m)
sh = rng.standard_normal(k)
B = rng.standard_normal((m, k))
Tdm = El.DistMatrix.from_global(jnp.asarray(Tm), MC, MR, g)
Bdm = El.DistMatrix.from_global(jnp.asarray(B), MC, MR, g)
Xms = El.blas.MultiShiftTrsm(LEFT, UPPER, NORMAL, 1.0, Tdm,
                             jnp.asarray(sh), Bdm)
Xg = np.asarray(Xms.global_array())[:, :k]
ref = np.stack([np.linalg.solve(Tm - s * np.eye(m), B[:, j])
                for j, s in enumerate(sh)], axis=1)
r = np.abs(Xg - ref).max() / (eps * m * np.abs(ref).max())
print(f"MultiShiftTrsm scaled resid {r:.3f} {'PASS' if r < 100 else 'FAIL'}")

# 3. sparse supernodal LDL on a 60x60 Laplacian (incl. dense-front route)
from elementalx.sparse import SparseMatrix
from elementalx.sparse import supernodal
def _lap(nx, ny):
    n = nx * ny
    S = SparseMatrix(n, n)
    for iy in range(ny):
        for ix in range(nx):
            k = iy * nx + ix
            S.queue_update(k, k, 4.0)
            if ix + 1 < nx:
                S.queue_update(k, k + 1, -1.0); S.queue_update(k + 1, k, -1.0)
            if iy + 1 < ny:
                S.queue_update(k, k + nx, -1.0); S.queue_update(k + nx, k, -1.0)
    S.process_queues()
    return S
S = _lap(60, 60)
t0 = time.time()
F = supernodal.factor(S)
t1 = time.time()
b = rng.standard_normal(S.m)
x = supernodal.solve(F, b)
t2 = time.time()
Ad = S.to_dense()
r = np.linalg.norm(Ad @ x - b) / (eps * S.m * np.linalg.norm(b))
print(f"supernodal 60x60: factor {t1-t0:.2f}s solve {t2-t1:.2f}s "
      f"scaled resid {r:.3f} {'PASS' if r < 100 else 'FAIL'}")

# 4. QuasiTriangEig through real Schur
n = 64
A = rng.standard_normal((n, n))
Adm = El.DistMatrix.from_global(jnp.asarray(A), MC, MR, g)
dec = El.lapack.Schur(Adm, want_vecs=True, form='real')
Xq = El.lapack.QuasiTriangEig(dec.T)
Tg = np.asarray(dec.T.global_array())[:n, :n]
Xg = np.asarray(Xq.global_array())[:n, :n]
from elementalx.lapack.schur_real import quasi_eigvals
wr, wi = quasi_eigvals(Tg.astype(np.float64))
lam = wr + 1j * wi
R = Tg @ Xg - Xg * lam[None, :]
r = np.abs(R).max() / (eps * n * max(1, np.abs(Tg).max()))
print(f"QuasiTriangEig scaled resid {r:.3f} {'PASS' if r < 100 else 'FAIL'}")
