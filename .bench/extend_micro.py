"""Micro-benchmark the labelled wing extend (the blocked fixed engine's
dominant op) at full-set shapes, with variants.  In-jit dependent chains
(block_until_ready is not a sync point through the axon tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/extend_micro.py
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax

B, NL, M, D = 58862, 10, 120, 2
K = 20  # chain length per trial


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
print(f"rtt baseline: {rtt*1e3:.1f} ms")

key = jax.random.PRNGKey(0)
env0 = jax.random.normal(key, (B, NL, M), jnp.float32)
sig0 = jnp.zeros((B,), jnp.float32)
core = jax.random.normal(key, (M, D, M), jnp.float32) / M**0.5
x = jax.random.uniform(key, (D, B), jnp.float32)


def chain(name, step, env0=env0):
    @jax.jit
    def run(e, s):
        return lax.fori_loop(0, K, lambda i, st: step(st[0], st[1]), (e, s))
    r = run(env0, sig0)
    fetch(r[1])
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = run(env0, sig0)
        fetch(r[1])
        ts.append(time.time() - t0)
    print(f"{name:46s} {(min(ts)-rtt)/K*1e3:8.2f} ms/extend")


def mk_extend(prec, carry_dt, div=True):
    def step(e, s):
        xt = x.T
        out = jnp.einsum("bkr,bs,asr->bka", e.astype(jnp.float32), xt, core,
                         precision=prec)
        if div:
            mx = jnp.max(jnp.abs(out), axis=(1, 2))
            safe = jnp.where(mx > 0, mx, 1.0)
            out = out / safe[:, None, None]
            s = s + jnp.log(safe)
        return out.astype(carry_dt), s
    return step


P = lax.Precision
chain("highest, f32 carry, div (status quo pre-fix)", mk_extend(P.HIGHEST, jnp.float32))
chain("default, f32 carry, div (current fast=True)", mk_extend(P.DEFAULT, jnp.float32))
chain("default, bf16 carry, div", mk_extend(P.DEFAULT, jnp.bfloat16),
      env0.astype(jnp.bfloat16))
chain("default, f32 carry, NO div", mk_extend(P.DEFAULT, jnp.float32, div=False))
chain("default, bf16 carry, NO div", mk_extend(P.DEFAULT, jnp.bfloat16, div=False),
      env0.astype(jnp.bfloat16))

# explicit two-step contraction: fold phi into the core FIRST (tiny [M,D,M]x[?]),
# hmm — phi is per-image, can't fold.  Instead contract (x,core) per image is
# rank-3 batched... the big matmul is unavoidable; measure the matmul alone:
def mm_only(e, s):
    out = jnp.einsum("bkr,rsa->bksa", e, core.transpose(2, 1, 0),
                     precision=P.DEFAULT)
    return out.sum(axis=2), s
chain("matmul only [B*NL,120]@[120,240], reduce s", mm_only)


# ---- round-4 variants: keep the [B,NL,D,M] outer-product intermediate out of
# HBM by expressing the extend as TWO clean matmuls with the per-image phi
# weights applied in the dots' elementwise epilogue (XLA output fusion).
C0 = core[:, 0, :]            # [a_in(r) x a_out] after transpose below
C1 = core[:, 1, :]


def mk_split_s(carry_dt, div=True, opdt=None):
    # out[b,k,a] = x0[b]*(e[b,k,:]@core[:,0_s,a_contract...]) — contraction is
    # over r (the core's RIGHT bond for a right wing): core[a,s,r] -> Cs.T [r,a]
    Cs0 = core[:, 0, :].T.copy()
    Cs1 = core[:, 1, :].T.copy()

    def step(e, s):
        ef = e.reshape(B * NL, M)
        if opdt is not None:
            ef = ef.astype(opdt)
        o0 = (ef @ (Cs0.astype(ef.dtype))).reshape(B, NL, M)
        o1 = (ef @ (Cs1.astype(ef.dtype))).reshape(B, NL, M)
        out = x[0][:, None, None] * o0 + x[1][:, None, None] * o1
        if div:
            mx = jnp.max(jnp.abs(out), axis=(1, 2))
            safe = jnp.where(mx > 0, mx, 1.0)
            out = out / safe[:, None, None]
            s = s + jnp.log(safe)
        return out.astype(carry_dt), s
    return step


chain("split-s 2xMM epilogue, f32 carry, div", mk_split_s(jnp.float32))
chain("split-s 2xMM epilogue, f32 carry, NO div", mk_split_s(jnp.float32, div=False))
chain("split-s 2xMM epilogue, bf16 carry, div", mk_split_s(jnp.bfloat16),
      env0.astype(jnp.bfloat16))
chain("split-s 2xMM epilogue, bf16 carry, NO div",
      mk_split_s(jnp.bfloat16, div=False), env0.astype(jnp.bfloat16))
chain("split-s 2xMM bf16 OPERANDS, f32 carry, div",
      mk_split_s(jnp.float32, opdt=jnp.bfloat16))


def mk_wide(carry_dt, div=True):
    # one wide dot [B*NL, M] @ [M, 2M], epilogue strided weighted-reduce over s
    Cw = jnp.concatenate([core[:, 0, :].T, core[:, 1, :].T], axis=1).copy()

    def step(e, s):
        o = (e.reshape(B * NL, M) @ Cw.astype(e.dtype)).reshape(B, NL, 2, M)
        out = x[0][:, None, None] * o[:, :, 0] + x[1][:, None, None] * o[:, :, 1]
        if div:
            mx = jnp.max(jnp.abs(out), axis=(1, 2))
            safe = jnp.where(mx > 0, mx, 1.0)
            out = out / safe[:, None, None]
            s = s + jnp.log(safe)
        return out.astype(carry_dt), s
    return step


chain("wide-MM [BNL,M]@[M,2M] epilogue, f32, div", mk_wide(jnp.float32))
chain("wide-MM epilogue, bf16 carry, NO div", mk_wide(jnp.bfloat16, div=False),
      env0.astype(jnp.bfloat16))
