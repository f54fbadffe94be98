"""Probe TPU eigh/QR variants for the split_bond hot path (VERDICT r2 item 2).

The gram split spends ~1.2 ms/bond in eigh[240,240] (.bench/bondstep_micro.py).
This measures whether XLA's eigh exposes cheaper configurations at that shape:
sort_eigenvalues=False, subset_by_index (top-maxm eigenpairs only), smaller /
MXU-aligned sizes, and the QR alternative for a warm-started subspace iteration.

Same in-jit dependent-chain timing as bondstep_micro.py (block_until_ready is
not a synchronization point through the axon tunnel).
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100


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
print(f"rtt+fetch baseline: {rtt*1e3:.1f} ms")


def chain_time(name, fn, x0, k=K, n=3):
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
    print(f"{name:52s} {t*1e3:8.3f} ms/op")


key = jax.random.PRNGKey(0)
for n in (120, 128, 240, 256):
    A = jax.random.normal(key, (n, n), jnp.float32)
    G0 = A @ A.T + n * jnp.eye(n)

    def eig_full(G, i):
        w, V = jnp.linalg.eigh(G)
        return G + 1e-9 * (V * w[None, :]) @ V.T
    chain_time(f"eigh [{n}] (jnp, sorted)", eig_full, G0)

    def eig_nosort(G, i):
        w, V = lax.linalg.eigh(G, sort_eigenvalues=False)
        return G + 1e-9 * (V * w[None, :]) @ V.T
    chain_time(f"eigh [{n}] sort=False", eig_nosort, G0)

    def eig_top(G, i, n=n):
        w, V = lax.linalg.eigh(G, subset_by_index=(n - min(n, 121), n))
        return G + 1e-9 * (V * w[None, :]) @ V.T
    try:
        chain_time(f"eigh [{n}] top-121 subset", eig_top, G0)
    except Exception as e:  # noqa: BLE001
        print(f"eigh [{n}] top-121 subset: unsupported ({type(e).__name__})")

# QR shapes for a warm-started subspace iteration alternative
for (r, c) in ((240, 128), (2400, 240), (240, 240)):
    M0 = jax.random.normal(key, (r, c), jnp.float32)

    def qr_step(M, i):
        Q, R = jnp.linalg.qr(M)
        return M + 1e-9 * Q
    chain_time(f"qr [{r},{c}]", qr_step, M0)
