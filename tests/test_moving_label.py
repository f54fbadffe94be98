"""Moving-label training mode: label rides with the active bond, wings stay thin."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps

from tests.test_mps_core import dense_vector, random_mps


def test_move_label_preserves_state():
    a = random_mps(n=6, m=4, label_site=3)
    rng = np.random.default_rng(1)
    xs = [rng.normal(size=(6, 2)) for _ in range(4)]
    before = [evaluate_mps(a, x) for x in xs]
    a.move_label(0, cutoff=1e-14)
    assert a.label_site == 0
    for x, want in zip(xs, before):
        np.testing.assert_allclose(evaluate_mps(a, x), want, rtol=1e-8, atol=1e-10)
    a.move_label(5, cutoff=1e-14)
    assert a.label_site == 5
    for x, want in zip(xs, before):
        np.testing.assert_allclose(evaluate_mps(a, x), want, rtol=1e-8, atol=1e-10)


def test_moving_mode_envs_are_label_free():
    from tests.test_engine import make_problem
    W, X, labels = make_problem(n=8, batch=10, label_site=4, seed=2)
    W.move_label(0, cutoff=1e-14)   # exact transport can grow bonds by d per step
    pw = pack(W, pad=max(40, W.max_bond()))
    eng = SweepEngine(pw, X, labels, lam=1e-3, npass=3, label_mode="moving")
    eng.init_envs()
    for j, (arr, sig) in eng.env.items():
        assert arr.ndim == 2, f"env at site {j} carries a label axis"
    hist = eng.run(Sweeps.constant(2, 2, 12, 1e-10), verbose=False)
    assert hist[-1].cost < hist[0].cost
    w2 = unpack(eng.packed())
    assert w2.label_site == 0  # sweeps end at bond 0, leftward


def test_moving_mode_learns():
    """Moving mode trades some per-maxm quality for 10x thinner wings (the reference
    fixed the label for exactly this reason, README.md:73); it must still learn."""
    from tests.test_engine import make_problem
    W, X, labels = make_problem(n=8, batch=24, label_site=4, seed=5)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)

    eng_f = SweepEngine(pack(W, pad=12), X, labels, lam=1e-4, npass=4)
    eng_f.init_envs()
    hf = eng_f.run(Sweeps.constant(3, 2, 12, 1e-10), verbose=False)

    Wm = W.copy()
    Wm.move_label(0, cutoff=1e-14)
    eng_m = SweepEngine(pack(Wm, pad=max(40, Wm.max_bond())), X, labels,
                        lam=1e-4, npass=4, label_mode="moving")
    eng_m.init_envs()
    hm = eng_m.run(Sweeps.constant(3, 2, 12, 1e-10), verbose=False)

    c0 = 24.0  # init cost on this problem ~ sum(|onehot|^2)
    assert hm[-1].cost < 0.3 * c0
    # fixed mode is the quality mode at equal maxm
    assert hf[-1].cost <= hm[-1].cost


def test_moving_mode_rejects_misplaced_label():
    from tests.test_engine import make_problem
    W, X, labels = make_problem(n=8, batch=4, label_site=4)
    with pytest.raises(ValueError, match="move the label"):
        SweepEngine(pack(W, pad=8), X, labels, label_mode="moving")
