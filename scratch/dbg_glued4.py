"""Locate worst non-orthogonal pairs after the full driver."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from elementalx.lapack.tridiag_eig import tridiag_eig


def glued(nblocks, glue):
    m = 21
    dblk = np.abs(np.arange(m) - 10).astype(np.float64)
    d = np.tile(dblk, nblocks)
    e = np.concatenate([
        np.concatenate([np.ones(m - 1), [glue]])
        for _ in range(nblocks)])[:nblocks * m - 1]
    return d, e


dnp, enp = glued(196, 1e-14)
n = dnp.shape[0]
w, Z = tridiag_eig(jnp.asarray(dnp), jnp.asarray(enp))
w = np.asarray(w); Z = np.asarray(Z)
eps = np.finfo(np.float64).eps
Gm = Z.T @ Z - np.eye(n)
ortho = np.abs(Gm).max()
print("ortho:", ortho, "bar:", 32 * n * eps)
i, j = np.unravel_index(np.argmax(np.abs(Gm)), Gm.shape)
print("worst pair:", i, j, "w:", w[i], w[j], "gap:", abs(w[i] - w[j]))
# distribution: how many pairs above bar, their gaps
bad = np.argwhere(np.abs(Gm) > 32 * n * eps)
gaps = np.abs(w[bad[:, 0]] - w[bad[:, 1]])
print("num bad pairs:", bad.shape[0], "gap range:",
      gaps.min() if len(gaps) else None, gaps.max() if len(gaps) else None)
# are they within the same ctol cluster?
tnorm = 10.0
ctol = max(16 * n * eps, 1.0 / (8 * n)) * tnorm
print("ctol:", ctol, "bad pairs with gap<ctol:", int((gaps < ctol).sum()))
