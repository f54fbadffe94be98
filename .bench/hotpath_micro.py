"""Microbenchmark of the per-bond CG hot contractions on the real TPU.

P[b,j]  = sum_astr Lphi[b,as] B5[as,trj] Rphi[b,tr]          (apply)
G[astrj]= sum_b    w[b,j] Lphi[b,as] Rphi[b,tr]              (outer)

Hypothesis: XLA materializes the [B, m*d*L] f32 intermediate (565 MB at B=58862)
to HBM every pass -> the bond loop is bandwidth-bound at ~10 GB/bond.
Variants measure einsum vs explicit two-stage (bf16 intermediate) vs wing dtypes.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
m, d, L = 120, 2, 10
AS = m * d
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)

LE = jax.random.normal(k1, (B, m), jnp.float32)
RE = jax.random.normal(k2, (B, m), jnp.float32)
xc = jax.random.normal(k3, (d, B), jnp.float32)
x1 = jax.random.normal(k4, (d, B), jnp.float32)
B5 = jax.random.normal(k5, (m, d, d, m, L), jnp.float32)
w = jax.random.normal(k1, (B, L), jnp.float32)

def wings(LE, RE, xc, x1, dt):
    Lphi = (LE[:, :, None] * xc.T[:, None, :]).reshape(B, AS)
    Rphi = (x1.T[:, :, None] * RE[:, None, :]).reshape(B, AS)
    return Lphi.astype(dt), Rphi.astype(dt)

def apply_ein(Lphi, Rphi, B5):
    return jnp.einsum("bx,xyj,by->bj", Lphi,
                      B5.reshape(AS, AS, L).astype(Lphi.dtype), Rphi,
                      preferred_element_type=jnp.float32)

def apply_2stage(Lphi, Rphi, B5, t1dt):
    T1 = jnp.einsum("bx,xyj->byj", Lphi, B5.reshape(AS, AS, L).astype(Lphi.dtype),
                    preferred_element_type=t1dt)
    return jnp.einsum("byj,by->bj", T1, Rphi, preferred_element_type=jnp.float32)

def outer_ein(w, Lphi, Rphi):
    return jnp.einsum("bj,bx,by->xyj", w.astype(Lphi.dtype), Lphi, Rphi,
                      preferred_element_type=jnp.float32)

def outer_2stage(w, Lphi, Rphi, t1dt):
    U = (w[:, None, :].astype(t1dt) * Rphi[:, :, None].astype(t1dt)).reshape(B, AS * L)
    return jnp.einsum("bx,bz->xz", Lphi, U,
                      preferred_element_type=jnp.float32).reshape(AS, AS, L)

def timeit(name, fn, *args, n=10):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    flops = 2 * B * AS * AS * L * 2  # two stages
    print(f"{name:42s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s")
    return dt

for wdt, wname in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
    Lphi, Rphi = wings(LE, RE, xc, x1, wdt)
    Lphi, Rphi = jax.block_until_ready((Lphi, Rphi))
    print(f"--- wings {wname} (B={B}) ---")
    timeit(f"apply einsum  wings={wname}", jax.jit(apply_ein), Lphi, Rphi, B5)
    timeit(f"apply 2stage T1=f32  wings={wname}",
           jax.jit(partial(apply_2stage, t1dt=jnp.float32)), Lphi, Rphi, B5)
    timeit(f"apply 2stage T1=bf16 wings={wname}",
           jax.jit(partial(apply_2stage, t1dt=jnp.bfloat16)), Lphi, Rphi, B5)
    timeit(f"outer einsum  wings={wname}", jax.jit(outer_ein), w, Lphi, Rphi)
    timeit(f"outer 2stage U=f32  wings={wname}",
           jax.jit(partial(outer_2stage, t1dt=jnp.float32)), w, Lphi, Rphi)
    timeit(f"outer 2stage U=bf16 wings={wname}",
           jax.jit(partial(outer_2stage, t1dt=jnp.bfloat16)), w, Lphi, Rphi)

# the fused pair as used per CG pass: pv then Ap from pv
def cg_pass_pair(Lphi, Rphi, B5, sig2):
    pv = apply_ein(Lphi, Rphi, B5)
    ap = outer_ein(pv * sig2[:, None], Lphi, Rphi)
    return ap, jnp.sum(pv * pv * sig2[:, None])

sig2 = jnp.ones((B,), jnp.float32)
for wdt, wname in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
    Lphi, Rphi = wings(LE, RE, xc, x1, wdt)
    timeit(f"cg pass pair wings={wname}", jax.jit(cg_pass_pair),
           Lphi, Rphi, B5, sig2)
