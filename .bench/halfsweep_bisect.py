"""Bisect the fused half-sweep's per-bond cost: which stage owns the time?

Builds a stripped copy of segment.half_sweep's loop body with stages gated:
  cg    - the CG solve (cg_bond, npass=4)
  split - split_bond (gram)
  cost  - post-split quadcost
Always on: row reads/writes, make_bond, env_extend, stats-lite.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from functools import partial
from tnml_tpu.train import bond as bond_ops
from tnml_tpu.train.env import env_extend

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
NBND = int(sys.argv[2]) if len(sys.argv) > 2 else 48
m, d, J, npass = 120, 2, 10, 4
ks = jax.random.split(jax.random.PRNGKey(0), 8)

env_st = (jax.random.normal(ks[0], (NBND, B, m)) * 0.1).astype(jnp.bfloat16)
sig_st = jnp.zeros((NBND, B), jnp.float32)
core_st = jax.random.normal(ks[1], (NBND, m, d, m), jnp.float32) / np.sqrt(m*d)
xl = jax.random.normal(ks[2], (NBND, d, B), jnp.float32)
xr = jax.random.normal(ks[3], (NBND, d, B), jnp.float32)
carry_core = jax.random.normal(ks[4], (m, d, m, J), jnp.float32) / (m*d)
Y = jax.nn.one_hot(jax.random.randint(ks[5], (B,), 0, J), J)
labels = jax.random.randint(ks[5], (B,), 0, J)
lam, cconv, cutoff = jnp.float32(1e-3), jnp.float32(1e-10), jnp.float32(1e-10)

def fetch(x): return float(jnp.asarray(x).ravel()[0])
@jax.jit
def triv(x): return x + 1.0
fetch(triv(jnp.float32(0)))
t0 = time.time()
for _ in range(10): fetch(triv(jnp.float32(0)))
rtt = (time.time() - t0) / 10
print(f"rtt {rtt*1e3:.0f} ms")

@partial(jax.jit, static_argnames=("do_cg", "do_split", "do_cost"),
         donate_argnums=(0, 1, 2))
def mini_half_sweep(env_st, sig_st, core_st, carry_core,
                    do_cg: bool, do_split: bool, do_cost: bool):
    nb = Y.shape[0]
    pad = carry_core.shape[0]
    carry0 = (jnp.zeros((nb, pad), jnp.float32).at[:, 0].set(1.0),
              jnp.zeros((nb,), jnp.float32))

    def body(i, st):
        env_st, sig_st, core_st, near_arr, near_sig, core_t, acc = st
        t = i
        opp_a = lax.dynamic_index_in_dim(env_st, t, keepdims=False)
        opp_s = lax.dynamic_index_in_dim(sig_st, t, keepdims=False)
        w_next = lax.dynamic_index_in_dim(core_st, t, keepdims=False)
        xlt = lax.dynamic_index_in_dim(xl, t, keepdims=False)
        xrt = lax.dynamic_index_in_dim(xr, t, keepdims=False)
        wl, wr = core_t, w_next
        LE, lsc, RE, rsc = near_arr, near_sig, opp_a, opp_s

        B5 = bond_ops.make_bond(wl, wr)
        if do_cg:
            cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xlt, xrt, Y, lam,
                                  cconv, npass=npass, fast=True,
                                  check_r0=False, fast_exact=True)
            B5n = cg.B5
        else:
            B5n = B5 * 0.9999
        if do_split:
            nwl, nwr, rank, te = bond_ops.split_bond(
                B5n, cutoff, jnp.int32(m), jnp.int32(2),
                label_leg="right", iso_left=True, method="gram")
        else:
            dep = 1e-9 * jnp.sum(B5n)
            nwl = w_next + dep          # label-free left core (label moves right)
            nwr = jnp.full((m, d, m, J), 1e-3, jnp.float32) + dep
        if do_cost:
            newB = bond_ops.make_bond(nwl, nwr)
            cost, per_label, ncor, reg = bond_ops.quadcost(
                newB, LE, lsc, RE, rsc, xlt, xrt, Y, labels, lam)
        else:
            cost = jnp.float32(0.0)
        new = env_extend(near_arr, near_sig, xlt, nwl, fromleft=True)
        env_st = lax.dynamic_update_index_in_dim(
            env_st, near_arr.astype(env_st.dtype), t, 0)
        sig_st = lax.dynamic_update_index_in_dim(sig_st, near_sig, t, 0)
        core_st = lax.dynamic_update_index_in_dim(core_st, nwl, t, 0)
        return (env_st, sig_st, core_st, new[0], new[1], nwr, acc + cost)

    init = (env_st, sig_st, core_st, carry0[0], carry0[1], carry_core,
            jnp.float32(0.0))
    out = lax.fori_loop(0, NBND, body, init)
    return out[0], out[1], out[2], out[6]

for name, kw in [
    ("full body", dict(do_cg=True, do_split=True, do_cost=True)),
    ("no cost", dict(do_cg=True, do_split=True, do_cost=False)),
    ("no split", dict(do_cg=True, do_split=False, do_cost=False)),
    ("no cg (split+cost only)", dict(do_cg=False, do_split=True, do_cost=True)),
    ("scan skeleton only", dict(do_cg=False, do_split=False, do_cost=False)),
]:
    e, s, c = env_st, sig_st, core_st
    r = mini_half_sweep(e, s, c, carry_core, **kw)
    fetch(r[3])
    ts = []
    for _ in range(3):
        e2, s2, c2 = r[0], r[1], r[2]
        t0 = time.time()
        r = mini_half_sweep(e2, s2, c2, carry_core, **kw)
        fetch(r[3])
        ts.append(time.time() - t0)
    per = (min(ts) - rtt) / NBND
    print(f"{name:28s} {per*1e3:8.3f} ms/bond  (call {min(ts):.2f}s)")
    env_st, sig_st, core_st = r[0], r[1], r[2]
