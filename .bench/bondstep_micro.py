"""Honest per-component timing through the axon tunnel.

block_until_ready does NOT synchronize on axon, so each component is repeated
K times INSIDE one jit via a dependent lax.fori_loop chain and timed by host
fetch of a scalar; per-op time = (t_chain - rtt) / K.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from functools import partial

from tnml_tpu.train import bond as bond_ops
from tnml_tpu.train.env import env_extend

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
m, d, L = 120, 2, 10
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
envdt = jnp.bfloat16
LE = (jax.random.normal(ks[0], (B, m)) / np.sqrt(m)).astype(envdt)
RE = (jax.random.normal(ks[1], (B, m)) / np.sqrt(m)).astype(envdt)
sigL = jnp.zeros((B,), jnp.float32)
sigR = jnp.zeros((B,), jnp.float32)
xc = jax.random.normal(ks[2], (d, B), jnp.float32)
x1 = jax.random.normal(ks[3], (d, B), jnp.float32)
B5 = jax.random.normal(ks[4], (m, d, d, m, L), jnp.float32) / (m * d)
Y = jax.nn.one_hot(jax.random.randint(ks[5], (B,), 0, L), L)
labels = jax.random.randint(ks[5], (B,), 0, L)
wcore = jax.random.normal(ks[6], (m, d, m), jnp.float32) / np.sqrt(m * d)

def fetch(x):
    return float(jnp.asarray(x).ravel()[0])

# RTT baseline: trivial jit + fetch
@jax.jit
def triv(x):
    return x + 1.0
fetch(triv(jnp.float32(0)))
t0 = time.time()
for _ in range(10):
    fetch(triv(jnp.float32(0)))
rtt = (time.time() - t0) / 10
print(f"rtt+fetch baseline: {rtt*1e3:.1f} ms")

def chain_time(name, fn, x0, k=K, n=3):
    """fn: x -> x (same shape); time k sequential applications in one jit."""
    @jax.jit
    def run(x):
        return lax.fori_loop(0, k, lambda i, c: fn(c, i), x0)
    r = run(x0)
    fetch(jax.tree_util.tree_leaves(r)[0])  # compile + run once
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = run(x0)
        fetch(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.time() - t0)
    t = (min(ts) - rtt) / k
    print(f"{name:46s} {t*1e3:8.3f} ms/op   (chain {min(ts):.2f}s / {k})")

# 1. one CG data-pass pair (apply + outer) at full batch
def cg_pair(Bx, i):
    Lphi, Rphi = bond_ops._wing_products(LE, RE, xc, x1, None)
    sig = jnp.exp(sigL + sigR)[:, None, None, None]
    pv = bond_ops.apply_bond(Bx, Lphi, Rphi) * sig
    Ap = bond_ops.outer_grad(pv * sig, Lphi, Rphi)
    return Bx + 1e-12 * Ap
chain_time("cg pass pair (apply+outer)", cg_pair, B5, k=300)

# 2. full cg_bond npass=4
def cg_full(Bx, i):
    r = bond_ops.cg_bond(Bx, LE, sigL, RE, sigR, xc, x1, Y,
                         jnp.float32(1e-3), jnp.float32(1e-10),
                         npass=4, fast=True, check_r0=False, fast_exact=True)
    return Bx * 0.999 + 1e-3 * r.B5
chain_time("cg_bond npass=4 (full solve)", cg_full, B5, k=60)

# 3. split_bond per method
for meth in ("gram", "qr", "svd"):
    def sp(Bx, i, meth=meth):
        wl, wr, rank, te = bond_ops.split_bond(
            Bx, jnp.float32(1e-10), jnp.int32(m), jnp.int32(2),
            label_leg="right", iso_left=True, method=meth)
        return Bx * 0.999 + 1e-3 * bond_ops.make_bond(wl, wr)
    chain_time(f"split_bond {meth}", sp, B5, k=100)

# 4. eigh alone at [240,240]
G0 = jnp.eye(m * d) + 0.01 * jax.random.normal(ks[7], (m * d, m * d))
G0 = G0 @ G0.T
def eig_step(G, i):
    w, V = jnp.linalg.eigh(G)
    return G + 1e-9 * (V * w[None, :]) @ V.T
chain_time("eigh [240,240]", eig_step, G0, k=100)

# 5. qr alone [2400, 240]
M0 = jax.random.normal(ks[7], (L * m * d, m * d))
def qr_step(M, i):
    Q, R = jnp.linalg.qr(M)
    return M + 1e-9 * Q
chain_time("qr [2400,240]", qr_step, M0, k=100)

# 6. svd alone [240, 2400]
M1 = jax.random.normal(ks[7], (m * d, L * m * d))
def svd_step(M, i):
    U, s, Vt = jnp.linalg.svd(M, full_matrices=False)
    return M + 1e-9 * (U * s[None, :]) @ Vt
chain_time("svd [240,2400]", svd_step, M1, k=50)

# 7. quadcost
def qc_step(Bx, i):
    c, pl, nc, reg = bond_ops.quadcost(Bx, LE, sigL, RE, sigR, xc, x1, Y,
                                       labels, jnp.float32(1e-3))
    return Bx * 0.9999 + 1e-12 * c
chain_time("quadcost", qc_step, B5, k=300)

# 8. env_extend
def ee_step(c, i):
    arr, sig = env_extend(c[0], c[1], xc, wcore, fromleft=True)
    return (arr, sig)
chain_time("env_extend", ee_step,
           (LE.astype(jnp.float32), sigL), k=300)
