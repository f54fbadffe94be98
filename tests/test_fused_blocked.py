"""Blocked (checkpointed-rebuild) fixed-label engine vs the resident fused engine.

The blocked engine (train/segment_blocked.py) runs the same per-bond math as
segment_fixed — plain_bond_body is literally shared — but rebuilds each K-bond
block's far wings from a single boundary row instead of keeping the full
bond-aligned stacks.  In f32 (env_dtype=None) the rebuild replays the exact
env_extend chain the resident engine's carry performed, so the trajectories
must agree tightly; with bf16 wing storage the boundary quantization adds one
rounding step per block and the comparison loosens.
"""

import numpy as np

import tests.conftest  # noqa: F401

from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps

from tests.test_engine import make_problem


def _pair(n, batch, c, seed, K, **kw):
    W, X, labels = make_problem(n=n, batch=batch, label_site=c, seed=seed)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    pad = max(16, W.max_bond())
    a = SweepEngine(pack(W, pad=pad), X, labels, label_mode="fixed",
                    fused_variant="resident", **kw)
    b = SweepEngine(pack(W, pad=pad), X, labels, label_mode="fixed",
                    fused_variant="blocked", blocked_K=K, **kw)
    return a, b, X


def _compare(a, b, sweeps, X, rtol=1e-5, atol=1e-7, out_rtol=1e-4,
             out_atol=1e-5, rank_agree=0.95):
    ha = a.run_fused(sweeps, verbose=False)
    hb = b.run_fused(sweeps, verbose=False)
    assert [(s.b, s.direction) for s in ha] == [(s.b, s.direction) for s in hb]
    ca = np.array([s.cost for s in ha])
    cb = np.array([s.cost for s in hb])
    np.testing.assert_allclose(ca, cb, rtol=rtol, atol=atol)
    ra = np.array([s.newm for s in ha])
    rb = np.array([s.newm for s in hb])
    assert (ra == rb).mean() >= rank_agree
    Wa, Wb = unpack(a.packed()), unpack(b.packed())
    assert Wa.label_site == Wb.label_site
    for i in range(min(4, X.shape[0])):
        np.testing.assert_allclose(evaluate_mps(Wa, X[i]),
                                   evaluate_mps(Wb, X[i]),
                                   rtol=out_rtol, atol=out_atol)


def test_blocked_matches_resident_f32():
    # remainder blocks on both segments (segA len 4 @ K=2; segB len 5 @ K=2)
    a, b, X = _pair(n=12, batch=14, c=5, seed=3, K=2, lam=1e-4, npass=3)
    _compare(a, b, Sweeps.constant(2, 2, 10, 1e-10), X)


def test_blocked_off_center_fast_exact():
    a, b, X = _pair(n=11, batch=10, c=7, seed=4, K=3, lam=1e-3, npass=2,
                    method="fast_conj_exact")
    _compare(a, b, Sweeps.constant(2, 2, 8, 1e-10), X)


def test_blocked_bf16_wings():
    import jax.numpy as jnp
    a, b, X = _pair(n=10, batch=12, c=4, seed=5, K=2, lam=1e-3, npass=2,
                    env_dtype=jnp.bfloat16)
    # bf16 rank ties flip on quantization noise (cf. test_fused_fixed's 0.9);
    # since round 5 bf16-stored wings also default to the bf16 rebuild carry +
    # nonorm pair (segment_blocked._carry_bf16/_nonorm), adding one rounding
    # per crossed site — tolerances match test_env_knobs' bf16 mode, which
    # guards against BROKEN numerics, not parity (the strict-carry opt-out is
    # covered by test_env_knobs.test_knob_rebuild_carry_optout)
    _compare(a, b, Sweeps.constant(2, 2, 8, 1e-10), X,
             rtol=3e-1, atol=1e-2, out_rtol=2e-1, out_atol=2e-2,
             rank_agree=0.8)


def test_blocked_sharded_matches_resident_sharded():
    """dp-sharded blocked engine == dp-sharded resident engine (verdict r3
    item 6: the blocked variant must run under a mesh, not only single-chip).

    Both engines are compared UNDER THE SAME SHARDING: sharded-vs-unsharded is
    not a valid tight comparison on this problem — the psum's different fp
    reduction order perturbs the near-degenerate center-bond eigensplit enough
    to fork truncation choices (measured: resident and blocked both diverge
    from their unsharded runs by the IDENTICAL 0.60 max-relative trajectory
    fork, i.e. the fork is the reduction order, not the engine)."""
    import jax

    from tnml_tpu.parallel.mesh import DataParallel, make_mesh

    ndev = min(4, len(jax.devices()))
    dp = DataParallel(make_mesh(ndev))
    W, X, labels = make_problem(n=12, batch=16, label_site=5, seed=7)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    pad = max(16, W.max_bond())
    kw = dict(label_mode="fixed", lam=1e-4, npass=3)
    a = SweepEngine(pack(W, pad=pad), X, labels, sharding=dp,
                    fused_variant="resident", **kw)
    b = SweepEngine(pack(W, pad=pad), X, labels, sharding=dp,
                    fused_variant="blocked", blocked_K=2, **kw)
    _compare(a, b, Sweeps.constant(2, 2, 10, 1e-10), X)


def test_blocked_learns_and_writes_back():
    W, X, labels = make_problem(n=10, batch=30, label_site=4, seed=6)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    for l in range(10):
        X[labels == l, l % 10] = [np.cos(0.1 + l * 0.15),
                                  np.sin(0.1 + l * 0.15)]
    eng = SweepEngine(pack(W, pad=16), X, labels, lam=1e-3, npass=3,
                      label_mode="fixed", fused_variant="blocked", blocked_K=3)
    h = eng.run_fused(Sweeps.constant(4, 2, 12, 1e-9), verbose=False)
    assert h[-1].cost < 0.6 * h[0].cost
    assert h[-1].ncorrect > h[0].ncorrect
    Wt = unpack(eng.packed())          # exercises the fixed writeback path
    assert Wt.label_site == 4
