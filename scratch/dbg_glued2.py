"""Stage-by-stage diagnosis of tridiag_eig on glued Wilkinson (n=4116).

Replicates the driver's stages with residual/ortho/rank prints after
each, to locate where the eigenbasis degrades.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from elementalx.lapack.tridiag_eig import (
    tridiag_eigvalsh, _solve_shifted)
from elementalx.blas.trinv import tri_inv_lower


def glued(nblocks, glue):
    m = 21
    dblk = np.abs(np.arange(m) - 10).astype(np.float64)
    d = np.tile(dblk, nblocks)
    e = np.concatenate([
        np.concatenate([np.ones(m - 1), [glue]])
        for _ in range(nblocks)])[:nblocks * m - 1]
    return d, e


nblocks = int(os.environ.get("NB", "196"))
dnp, enp = glued(nblocks, 1e-14)
n = dnp.shape[0]
d = jnp.asarray(dnp); e = jnp.asarray(enp)
eps = np.finfo(np.float64).eps

w = np.asarray(tridiag_eigvalsh(d, e))
tnorm = max(np.abs(dnp).max(), np.abs(enp).max())
print("n =", n, "tnorm =", tnorm)

ctol = max(16 * n * eps, 1.0 / (8 * n)) * max(tnorm, 1.0)
newc = np.concatenate([[True], np.diff(w) > ctol])
cid = np.cumsum(newc)
sizes = np.bincount(cid)
print("ctol =", ctol, "clusters:", cid.max(), "max size:", sizes.max(),
      "sizes>1:", (sizes > 1).sum())

gap_tol = eps * max(tnorm, 1.0)
idx = np.arange(n)
jitter = ((idx % 8) - 3.5) * gap_tol
shifts = w + jitter

key = jax.random.key(7)
b0 = jax.random.normal(key, (n, n), jnp.float64)


@jax.jit
def invit(shifts, B):
    def one(lam, b):
        x = _solve_shifted(d, e, lam, b)
        nx = jnp.sqrt(jnp.sum(x * x))
        return x / jnp.where(nx == 0, 1, nx)
    return jax.vmap(one)(shifts, B)


def report(tag, Zc):
    Zc = np.asarray(Zc)
    TZ = dnp[:, None] * Zc
    TZ[1:] += enp[:, None] * Zc[:-1]
    TZ[:-1] += enp[:, None] * Zc[1:]
    lam = np.sum(Zc * TZ, axis=0)
    R = np.abs(TZ - Zc * lam[None, :])
    resid = R.max() / (eps * n * np.abs(w).max())
    orth = np.abs(Zc.T @ Zc - np.eye(n)).max()
    print(f"{tag}: scaled resid {resid:.3e}  ortho {orth:.3e}  "
          f"worstcol {int(np.argmax(R.max(axis=0)))}")
    return R.max(axis=0)


Mcl = jnp.asarray(cid[:, None] == cid[None, :])
hiprec = jax.lax.Precision.HIGHEST


@jax.jit
def cluster_qr(Z, reg):
    G = jnp.matmul(Z.T, Z, precision=hiprec)
    Gm = jnp.where(Mcl, G, jnp.zeros((), Z.dtype)) + reg * jnp.eye(
        n, dtype=Z.dtype)
    Lc = jnp.linalg.cholesky(Gm)
    bad = jnp.any(~jnp.isfinite(Lc))
    Lc = jnp.where(jnp.isfinite(Lc), Lc, jnp.eye(n, dtype=Z.dtype))
    return jnp.matmul(Z, tri_inv_lower(Lc).T, precision=hiprec), bad


Z = invit(jnp.asarray(shifts), b0)   # rows = eigvecs
report("round1 invit", np.asarray(Z).T)

Zc, bad = cluster_qr(jnp.asarray(Z).T, 16 * n * eps)
print("qr1 chol NaN:", bool(bad))
report("after qr1", Zc)

# Rayleigh shifts
Zr = np.asarray(Zc).T
TZ = dnp[None, :] * Zr
TZ[:, 1:] += enp[None, :] * Zr[:, :-1]
TZ[:, :-1] += enp[None, :] * Zr[:, 1:]
w_r = np.sum(Zr * TZ, axis=1)
shifts2 = w_r + jitter

Z2 = invit(jnp.asarray(shifts2), jnp.asarray(Zr))
report("round2 invit", np.asarray(Z2).T)

Z3, bad = cluster_qr(jnp.asarray(Z2).T, 16 * n * eps)
print("qr2 chol NaN:", bool(bad))
cr = report("after qr2", Z3)

Z4, bad = cluster_qr(Z3, 0.0)
print("qr3 chol NaN:", bool(bad))
cr = report("after qr3 (reg=0)", Z4)

# where are the bad columns relative to clusters?
bad_cols = np.where(cr > 1e-6 * cr.max() + 100)[0]
print("num cols scaled resid > 100:",
      int((cr / (eps * n * np.abs(w).max()) > 100).sum()))
worst = np.argsort(-cr)[:8]
print("worst cols:", worst, "their cluster sizes:",
      sizes[cid[worst]], "their w:", w[worst])
