import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from elementalx.lapack.tridiag_eig import tridiag_eig, tridiag_eigvalsh

def glued(nblocks, glue):
    m = 21
    dblk = np.abs(np.arange(m) - 10).astype(np.float64)
    d = np.tile(dblk, nblocks)
    e = np.concatenate([
        np.concatenate([np.ones(m - 1), [glue]])
        for _ in range(nblocks)])[:nblocks * m - 1]
    return d, e

nblocks = int(os.environ.get("NB", "8"))
d, e = glued(nblocks, 1e-14)
n = d.shape[0]
w, Z = tridiag_eig(jnp.asarray(d), jnp.asarray(e))
w = np.asarray(w); Z = np.asarray(Z)
eps = np.finfo(np.float64).eps
import scipy.linalg as sla
wref = sla.eigvalsh_tridiagonal(d, e)
print("n =", n)
print("max |w - wref| =", np.max(np.abs(np.sort(w) - wref)))
TZ = d[:, None] * Z
TZ[1:] += e[:, None] * Z[:-1]
TZ[:-1] += e[:, None] * Z[1:]
R = np.abs(TZ - Z * w[None, :])
resid = R.max() / (eps * n * np.abs(w).max())
print("scaled resid =", resid)
bad = np.argmax(R.max(axis=0))
print("worst col:", bad, "w[bad] =", w[bad], "colres =", R[:, bad].max(),
      "colnorm =", np.linalg.norm(Z[:, bad]))
ortho = np.abs(Z.T @ Z - np.eye(n)).max()
print("ortho =", ortho, "bar =", 32 * n * eps)
# how wide are the clusters / residuals per column
cr = R.max(axis=0)
print("num cols resid>1e-10:", (cr > 1e-10).sum(), " >1e-6:", (cr > 1e-6).sum())
idx = np.argsort(-cr)[:10]
print("worst cols:", idx, "resids:", cr[idx], "w:", w[idx])
