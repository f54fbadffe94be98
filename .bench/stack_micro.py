"""Is the in-scan env-stack row update in-place or a copy?  And what do the
non-hoisted wing products cost?  Honest chain timing (axon: fetch-synced)."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax import lax

from tnml_tpu.train import bond as bond_ops

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
NB = 783
m, d, L = 120, 2, 10
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)

def fetch(x):
    return float(jnp.asarray(x).ravel()[0])

@jax.jit
def triv(x):
    return x + 1.0
fetch(triv(jnp.float32(0)))
t0 = time.time()
for _ in range(10):
    fetch(triv(jnp.float32(0)))
rtt = (time.time() - t0) / 10
print(f"rtt: {rtt*1e3:.1f} ms")

# 1. row read+extend+write over a [NB, B, m] bf16 stack, K iterations
stack = jnp.zeros((NB, B, m), jnp.bfloat16)
xc = jax.random.normal(ks[2], (d, B), jnp.float32)
wcore = jax.random.normal(ks[3], (m, d, m), jnp.float32) / np.sqrt(m * d)
K = 100

@partial(jax.jit, donate_argnums=(0,))
def stack_loop(st):
    def body(i, st):
        t = i % NB
        row = lax.dynamic_index_in_dim(st, t, keepdims=False).astype(jnp.float32)
        new = jnp.einsum("bl,ldr,db->br", row, wcore, xc)
        return lax.dynamic_update_index_in_dim(st, new.astype(st.dtype), t, 0)
    return lax.fori_loop(0, K, body, st)

r = stack_loop(stack); fetch(r[0, 0, 0])
ts = []
for _ in range(3):
    t0 = time.time(); r = stack_loop(r); fetch(r[0, 0, 0]); ts.append(time.time() - t0)
stack = r
print(f"stack row read+extend+write: {(min(ts)-rtt)/K*1e3:8.3f} ms/op")

# 2. wing products NOT hoistable (row depends on i)
LE = (jax.random.normal(ks[0], (B, m)) / np.sqrt(m)).astype(jnp.bfloat16)
RE = (jax.random.normal(ks[1], (B, m)) / np.sqrt(m)).astype(jnp.bfloat16)
B5 = jax.random.normal(ks[4], (m, d, d, m, L), jnp.float32) / (m * d)
sig = jnp.zeros((B,), jnp.float32)

@jax.jit
def pair_nohoist(st, Bx):
    def body(i, carry):
        st, Bx = carry
        row = lax.dynamic_index_in_dim(st, i % NB, keepdims=False)
        Lphi, Rphi = bond_ops._wing_products(row, RE, xc, xc, None)
        s4 = jnp.exp(sig + sig)[:, None, None, None]
        pv = bond_ops.apply_bond(Bx, Lphi, Rphi) * s4
        Ap = bond_ops.outer_grad(pv * s4, Lphi, Rphi)
        return st, Bx + 1e-12 * Ap
    return lax.fori_loop(0, K, body, (st, Bx))[1]

r = pair_nohoist(stack, B5); fetch(r[0, 0, 0, 0, 0])
ts = []
for _ in range(3):
    t0 = time.time(); r = pair_nohoist(stack, B5); fetch(r[0, 0, 0, 0, 0]); ts.append(time.time() - t0)
print(f"cg pair, wing from stack row:  {(min(ts)-rtt)/K*1e3:8.3f} ms/op")


def chain_time(name, fn, x0, k=50, n=3):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, k, lambda i, c: fn(c, i), x0)
    r = run(x0)
    fetch(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = run(x0)
        fetch(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.time() - t0)
    t = (min(ts) - rtt) / k
    print(f"{name:46s} {t*1e3:8.3f} ms/op   (chain {min(ts):.2f}s / {k})")

# 3. the REAL fused_bond_step (moving-label layout), chained
from tnml_tpu.train import step as step_ops
hyp_f = jnp.array([1e-3, 1e-10, 1e-10, 1e-8, 0.0, 1.0], jnp.float32)
hyp_i = jnp.array([m, 2], jnp.int32)
wl0 = jax.random.normal(ks[5], (m, d, m), jnp.float32) / np.sqrt(m * d)
wr0 = jax.random.normal(ks[5], (m, d, m, L), jnp.float32) / np.sqrt(m * d)
Yoh = jax.nn.one_hot(jax.random.randint(ks[5], (B,), 0, L), L)
labels = jax.random.randint(ks[5], (B,), 0, L)
key0 = jnp.zeros((1,), jnp.uint32)

def fbs(carry, i):
    wl, wr = carry
    nwl, nwr, env_arr, env_sig, stats = step_ops.fused_bond_step(
        wl, wr, LE.astype(jnp.float32), sig, RE.astype(jnp.float32), sig,
        xc, xc, Yoh, labels, hyp_f, hyp_i, key0,
        label_leg="right", iso_left=True, method="fast_conj_exact", npass=4,
        check_r0=False, report=True, use_noise=False, env_dtype=None,
        mxu_dtype=None, svd_method="gram", replace=False, damp=False,
        monotone=False)
    return (nwl * 0.999 + 0.001 * wl, nwr * 0.999 + 0.001 * wr)

chain_time("fused_bond_step (real, report)", fbs, (wl0, wr0), k=60)

def fbs_mono(carry, i):
    wl, wr = carry
    nwl, nwr, env_arr, env_sig, stats = step_ops.fused_bond_step(
        wl, wr, LE.astype(jnp.float32), sig, RE.astype(jnp.float32), sig,
        xc, xc, Yoh, labels, hyp_f, hyp_i, key0,
        label_leg="right", iso_left=True, method="fast_conj_exact", npass=4,
        check_r0=False, report=True, use_noise=False, env_dtype=None,
        mxu_dtype=None, svd_method="gram", replace=False, damp=False,
        monotone=True)
    return (nwl * 0.999 + 0.001 * wl, nwr * 0.999 + 0.001 * wr)

chain_time("fused_bond_step (real, monotone)", fbs_mono, (wl0, wr0), k=60)
