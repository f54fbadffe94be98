"""Scan-fused half-sweeps vs the per-bond engine (must be numerically equivalent)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps

from tests.test_engine import make_problem


def test_fused_matches_perbond_moving():
    W, X, labels = make_problem(n=8, batch=12, label_site=4, seed=2)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    W.move_label(0, cutoff=1e-14)
    pad = max(24, W.max_bond())

    eng_a = SweepEngine(pack(W, pad=pad), X, labels, lam=1e-4, npass=3,
                        label_mode="moving")
    eng_a.init_envs()
    ha = eng_a.run(Sweeps.constant(2, 2, 12, 1e-10), verbose=False)

    eng_b = SweepEngine(pack(W, pad=pad), X, labels, lam=1e-4, npass=3,
                        label_mode="moving")
    hb = eng_b.run_fused(Sweeps.constant(2, 2, 12, 1e-10), verbose=False)

    assert len(ha) == len(hb)
    # same per-bond cost trajectory
    ca = np.array([s.cost for s in ha])
    cb = np.array([s.cost for s in hb])
    np.testing.assert_allclose(ca, cb, rtol=2e-2, atol=1e-4)
    # same bond visit order encoded in stats
    assert [(s.b, s.direction) for s in ha] == [(s.b, s.direction) for s in hb]
    # same trained model outputs
    Wa, Wb = unpack(eng_a.packed()), unpack(eng_b.packed())
    for i in range(4):
        np.testing.assert_allclose(evaluate_mps(Wa, X[i]), evaluate_mps(Wb, X[i]),
                                   rtol=5e-2, atol=1e-3)


def test_fused_single_model():
    W, X, labels = make_problem(n=7, batch=16, label_site=None, seed=5)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    X[labels == 3, 0] = [0.9, np.sqrt(1 - 0.81)]
    eng = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=4,
                      target_label=3, method="fast_conj_exact")
    h = eng.run_fused(Sweeps.constant(3, 2, 12, 1e-9), verbose=False)
    assert h[-1].cost < 0.5 * h[0].cost
    W2 = unpack(eng.packed())
    outs = np.array([float(evaluate_mps(W2, X[i])) for i in range(16)])
    tgt = labels == 3
    assert np.abs(outs[tgt] - 1.0).mean() < 0.4
    assert np.abs(outs[~tgt]).mean() < 0.4


def test_fused_rejects_edge_fixed_label():
    # a fixed label at the chain edge leaves an empty scan segment: per-bond only
    W, X, labels = make_problem(n=6, batch=4, label_site=1)
    eng = SweepEngine(pack(W, pad=8), X, labels)
    with pytest.raises(ValueError, match="fused"):
        eng.run_fused(Sweeps.constant(1, 2, 8, 1e-10), verbose=False)


def test_fused_sharded_matches_unsharded():
    import jax
    from tnml_tpu.parallel.mesh import DataParallel, make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    W, X, labels = make_problem(n=8, batch=16, label_site=4, seed=2)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    W.move_label(0, cutoff=1e-14)
    pad = max(24, W.max_bond())
    e1 = SweepEngine(pack(W, pad=pad), X, labels, lam=1e-4, npass=3,
                     label_mode="moving")
    h1 = e1.run_fused(Sweeps.constant(2, 2, 12, 1e-10), verbose=False)
    dp = DataParallel(make_mesh(4))
    e2 = SweepEngine(pack(W, pad=pad), X, labels, lam=1e-4, npass=3,
                     label_mode="moving", sharding=dp)
    h2 = e2.run_fused(Sweeps.constant(2, 2, 12, 1e-10), verbose=False)
    assert h1[-1].cost == pytest.approx(h2[-1].cost, rel=1e-3)


def test_fused_ranks_tracked():
    W, X, labels = make_problem(n=8, batch=10, label_site=4, seed=7)
    W.move_label(0, cutoff=1e-14)
    pad = max(24, W.max_bond())
    eng = SweepEngine(pack(W, pad=pad), X, labels, label_mode="moving")
    eng.run_fused(Sweeps.constant(1, 2, 6, 1e-10), verbose=False)
    assert eng.ranks.max() <= 6 + 0  # maxm honored
    assert eng.ranks[0] == 1 and eng.ranks[-1] == 1


def test_evaluator_matches_full_test():
    from tnml_tpu.eval.fulltest import Evaluator, full_test
    W, X, labels = make_problem(n=8, batch=20, label_site=4, seed=3)
    ev = Evaluator(X, labels)
    rep_a = ev.evaluate(pack(W, pad=8))
    rep_b = full_test(W, X, labels)
    assert rep_a.n_correct == rep_b.n_correct
    np.testing.assert_array_equal(rep_a.predictions, rep_b.predictions)


def test_two_axis_mesh_matches_unsharded():
    import jax
    from tnml_tpu.parallel.mesh import TwoAxisParallel, make_mesh_2d
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    W, X, labels = make_problem(n=8, batch=16, label_site=4, seed=2)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    tp = TwoAxisParallel(make_mesh_2d(4, 2))
    e1 = SweepEngine(pack(W, pad=8), X, labels, lam=1e-3, npass=2, sharding=tp)
    e1.init_envs()
    h1 = e1.run(Sweeps.constant(1, 2, 8, 1e-10), verbose=False)
    e2 = SweepEngine(pack(W, pad=8), X, labels, lam=1e-3, npass=2)
    e2.init_envs()
    h2 = e2.run(Sweeps.constant(1, 2, 8, 1e-10), verbose=False)
    assert h1[-1].cost == pytest.approx(h2[-1].cost, rel=1e-3)


def test_evaluator_engine_matches_packed():
    """evaluate_engine contracts the fused DEVICE stacks directly; must agree
    with the packed-cores path for both fused layouts."""
    from tests.test_engine import make_problem
    from tnml_tpu.eval.fulltest import Evaluator
    from tnml_tpu.mps.core import MPS
    from tnml_tpu.mps.pack import pack
    from tnml_tpu.train.engine import SweepEngine
    from tnml_tpu.train.schedule import Sweeps

    for label_site, mode in ((1, "moving"), (3, "fixed")):
        W, X, labels = make_problem(n=7, batch=12, label_site=label_site,
                                    seed=5)
        if mode == "moving":
            W.move_label(0, cutoff=1e-12, maxm=8)
        eng = SweepEngine(pack(W, pad=8), X, labels, lam=1e-3, npass=2,
                          label_mode=mode)
        eng.run_fused(Sweeps.constant(1, 2, 8, 1e-10), verbose=False)
        ev = Evaluator(X, labels)
        a = ev.evaluate_engine(eng)
        b = ev.evaluate(eng.packed())
        np.testing.assert_array_equal(a.predictions, b.predictions)
        assert a.n_correct == b.n_correct
