"""A/B LU driver blocksize with _SLAB_INNER=512 at 16384 f32."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import elementalx as El
from elementalx import DistMatrix

def chain_time(mk, args, k1=1, k2=3, reps=3):
    f1, f2 = mk(k1), mk(k2)
    float(f1(*args)); float(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0=time.perf_counter(); float(f1(*args))
        t1=time.perf_counter(); float(f2(*args))
        t2=time.perf_counter()
        best=min(best, ((t2-t1)-(t1-t0))/(k2-k1))
    return best

N=16384
print("devices:", jax.devices(), flush=True)
grid=El.Grid(devices=jax.devices())
rng=np.random.default_rng(0)
A=DistMatrix.from_global(jnp.asarray(rng.standard_normal((N,N)),jnp.float32),grid=grid)
for nb in (1024, 2048):
    def mk(k, nb=nb):
        def f(A):
            def body(_, X):
                F,P=El.LU(X, blocksize=nb)
                s=jnp.sum(F.data[0])*1e-30
                return X.with_data(X.data.at[0,0].add(s))
            X=jax.lax.fori_loop(0,k,body,A)
            return jnp.sum(X.data[0])
        return jax.jit(f)
    t=chain_time(mk,(A,))
    print(f"LU nb={nb} ib=512: {t*1e3:.1f} ms  {(2/3)*N**3/t/1e12:.1f} TF/s", flush=True)
