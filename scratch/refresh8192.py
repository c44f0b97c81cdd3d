"""Refresh 8192-size PERF rows after the precision/bandwidth work."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import elementalx as El
from elementalx import DistMatrix

def chain_time(mk, args, k1=1, k2=5, reps=3):
    f1, f2 = mk(k1), mk(k2)
    float(f1(*args)); float(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0=time.perf_counter(); float(f1(*args))
        t1=time.perf_counter(); float(f2(*args))
        t2=time.perf_counter()
        best=min(best, ((t2-t1)-(t1-t0))/(k2-k1))
    return best

N=8192
print("devices:", jax.devices(), flush=True)
grid=El.Grid(devices=jax.devices())
rng=np.random.default_rng(0)
a0=rng.standard_normal((N,N)).astype(np.float32)
hpd=(a0@a0.T/N + 2*np.eye(N)).astype(np.float32)

def timed(tag, fn, X, flops, k2=5):
    def mk(k):
        def f(X):
            def body(_, Y):
                out = fn(Y)
                s = jnp.sum(out.data.astype(jnp.float32))*1e-30
                return Y.with_data(Y.data.at[0,0].add(s.astype(Y.dtype)))
            Y = jax.lax.fori_loop(0,k,body,X)
            return jnp.sum(Y.data.astype(jnp.float32))
        return jax.jit(f)
    t=chain_time(mk,(X,),k2=k2)
    print(f"{tag}: {t*1e3:.1f} ms  {flops/t/1e12:.1f} TF/s", flush=True)

from elementalx.core.types import LOWER
for dt, tag in ((jnp.float32,"f32"), (jnp.bfloat16,"bf16")):
    H=DistMatrix.from_global(jnp.asarray(hpd,dt),grid=grid)
    timed(f"Cholesky {tag} {N}", lambda Y: El.Cholesky(LOWER, Y), H, N**3/3, k2=8)
A=DistMatrix.from_global(jnp.asarray(a0),grid=grid)
timed(f"LU f32 {N}", lambda Y: El.LU(Y)[0], A, (2/3)*N**3, k2=4)
timed(f"QR f32 {N}", lambda Y: El.QR(Y).packed, A, (4/3)*N**3, k2=4)
Ab=DistMatrix.from_global(jnp.asarray(a0,jnp.bfloat16),grid=grid)
timed(f"LU bf16 {N}", lambda Y: El.LU(Y)[0], Ab, (2/3)*N**3, k2=4)
timed(f"QR bf16 {N}", lambda Y: El.QR(Y).packed, Ab, (4/3)*N**3, k2=4)
