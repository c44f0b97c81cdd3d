"""Gram-structure diagnosis of round-1 invit images within one glued-
Wilkinson cluster."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from elementalx.lapack.tridiag_eig import tridiag_eigvalsh, _solve_shifted


def glued(nblocks, glue):
    m = 21
    dblk = np.abs(np.arange(m) - 10).astype(np.float64)
    d = np.tile(dblk, nblocks)
    e = np.concatenate([
        np.concatenate([np.ones(m - 1), [glue]])
        for _ in range(nblocks)])[:nblocks * m - 1]
    return d, e


nblocks = 196
dnp, enp = glued(nblocks, 1e-14)
n = dnp.shape[0]
d = jnp.asarray(dnp); e = jnp.asarray(enp)
eps = np.finfo(np.float64).eps

w = np.asarray(tridiag_eigvalsh(d, e))
tnorm = 10.0
ctol = max(16 * n * eps, 1.0 / (8 * n)) * tnorm
newc = np.concatenate([[True], np.diff(w) > ctol])
cid = np.cumsum(newc)

# the cluster containing w ~ 6.00021752 (the failing one)
cids = cid[np.argmin(np.abs(w - 6.00021752))]
cols = np.where(cid == cids)[0]
print("cluster size:", cols.shape[0], "w range:",
      w[cols].min(), w[cols].max(), "spread:", w[cols].max() - w[cols].min())
# sub-structure of w inside the cluster
ww = np.sort(w[cols])
gaps = np.diff(ww)
print("top 5 internal gaps:", np.sort(gaps)[-5:])

gap_tol = eps * tnorm
jitter = ((cols % 8) - 3.5) * gap_tol
shifts = w[cols] + jitter

key = jax.random.key(7)
b0 = np.asarray(jax.random.normal(key, (n, n), jnp.float64))[cols]


@jax.jit
def invit(shifts, B):
    def one(lam, b):
        x = _solve_shifted(d, e, lam, b)
        nx = jnp.sqrt(jnp.sum(x * x))
        return x / jnp.where(nx == 0, 1, nx)
    return jax.vmap(one)(shifts, B)


X = np.asarray(invit(jnp.asarray(shifts), jnp.asarray(b0))).T  # (n, k)
G = X.T @ X
k = G.shape[0]
ev = np.linalg.eigvalsh(G)
print("Gram eigs: min", ev[0], "max", ev[-1],
      "n<1e-12:", (ev < 1e-12).sum(), "n<1e-8:", (ev < 1e-8).sum())
off = np.abs(G - np.eye(k)).max()
print("max offdiag:", off)
# how many distinct-ish directions? numerical rank at 1e-8
print("rank@1e-8:", (ev > 1e-8 * ev[-1]).sum(), "of", k)

# amplification per solve: norms before normalization
@jax.jit
def raw(shifts, B):
    def one(lam, b):
        x = _solve_shifted(d, e, lam, b)
        return jnp.sqrt(jnp.sum(x * x))
    return jax.vmap(one)(shifts, B)

nr = np.asarray(raw(jnp.asarray(shifts), jnp.asarray(b0)))
print("solve gains: min %.3e max %.3e" % (nr.min(), nr.max()))
