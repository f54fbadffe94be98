"""n_labels generality: the engines must work for any number of classes, not
just the reference's 10 (VERDICT r2 item 6 — the API surface promises
``attach_label(n_labels=...)`` generality, so the hot path must honor it)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps


NL = 4


def make_problem4(n=8, batch=12, d=2, label_site=3, seed=11):
    r = np.random.default_rng(seed)
    X = r.uniform(0.2, 1.0, size=(batch, n, d)).astype(np.float32)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    labels = r.integers(0, NL, size=batch)
    dims = [1] + [4] * (n - 1) + [1]
    cores = []
    for j in range(n):
        sh = (dims[j], d, dims[j + 1]) + ((NL,) if j == label_site else ())
        cores.append(r.normal(size=sh) * 0.3)
    W = MPS(cores, label_site=label_site)
    return W, X, labels


def host_cost4(W, X, labels, lam, B5):
    c = 0.0
    for i in range(X.shape[0]):
        f = evaluate_mps(W, X[i])
        e = np.eye(NL)[labels[i]] - f
        c += float(e @ e)
    return c + lam * float(np.sum(np.asarray(B5) ** 2))


def test_perbond_nl4_matches_host():
    W, X, labels = make_problem4()
    eng = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3)
    assert eng.nl == NL
    eng.init_envs()
    cost0, pl0, _, _ = eng.quadcost(0)
    assert pl0.shape == (NL,)
    ref = host_cost4(W, X, labels, 1e-3, eng.bond_tensor(0))
    np.testing.assert_allclose(float(cost0), ref, rtol=1e-4)
    hist = eng.run(Sweeps.constant(2, 2, 8, 1e-10), verbose=False)
    assert hist[-1].per_label_cost.shape == (NL,)
    assert hist[-1].cost < float(cost0)
    assert 0 <= hist[-1].ncorrect <= X.shape[0]


def test_fused_fixed_nl4_matches_perbond():
    W, X, labels = make_problem4(n=8, label_site=3)
    a = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3)
    b = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3)
    sweeps = Sweeps.constant(2, 2, 8, 1e-10)
    a.init_envs()
    ha = a.run(sweeps, verbose=False)
    hb = b.run_fused(sweeps, verbose=False)
    ca = np.array([s.cost for s in ha])
    cb = np.array([s.cost for s in hb])
    np.testing.assert_allclose(ca, cb, rtol=2e-2, atol=1e-4)


def test_blocked_nl4_matches_resident():
    # the sqrt-memory blocked engine must honor n_labels too: its labelled
    # far-wing buffer shape derives from the label core's own axis
    W, X, labels = make_problem4(n=10, label_site=4)
    a = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3,
                    fused_variant="resident")
    b = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3,
                    fused_variant="blocked", blocked_K=2)
    sweeps = Sweeps.constant(2, 2, 8, 1e-10)
    ha = a.run_fused(sweeps, verbose=False)
    hb = b.run_fused(sweeps, verbose=False)
    assert hb[-1].per_label_cost.shape == (NL,)
    ca = np.array([s.cost for s in ha])
    cb = np.array([s.cost for s in hb])
    np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-6)


def test_fused_moving_nl4_runs_and_descends():
    W, X, labels = make_problem4(n=8, label_site=3)
    W.move_label(0, cutoff=1e-12, maxm=8)
    eng = SweepEngine(pack(W, pad=12), X, labels, lam=1e-3, npass=3,
                      label_mode="moving", method="fast_conj_exact")
    hist = eng.run_fused(Sweeps.constant(3, 2, 8, 1e-10), verbose=False)
    assert eng.nl == NL
    assert hist[-1].per_label_cost.shape == (NL,)
    costs = [h.cost for h in hist if h.cost == h.cost]
    assert costs[-1] < costs[0]


def test_single_nl4_buckets():
    # label-free model: per-label buckets span the distinct true labels
    W, X, labels = make_problem4(label_site=None)
    W = MPS([c for c in W.cores], label_site=None)
    eng = SweepEngine(pack(W, pad=12), X, labels, lam=1e-4, npass=2,
                      target_label=1)
    assert eng.nl == int(labels.max()) + 1
    eng.init_envs()
    hist = eng.run(Sweeps.constant(1, 2, 8, 1e-10), verbose=False)
    assert hist[-1].per_label_cost.shape == (eng.nl,)


def test_cold_start_and_fulltest_nl4():
    from tnml_tpu.eval.fulltest import full_test
    from tnml_tpu.models.fixedl import cold_start

    r = np.random.default_rng(0)
    X = r.uniform(0.0, 1.0, size=(40, 8, 2)).astype(np.float32)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    labels = np.repeat(np.arange(NL), 10)
    w = cold_start(X, labels, ninitial=3, n_labels=NL, verbose=False)
    assert w.cores[w.label_site].shape[-1] == NL
    rep = full_test(w, X, labels)
    assert len(rep.per_digit_total) == NL
    assert rep.per_digit_total.sum() == 40


def test_rand_imgs_rejection_parity():
    from tnml_tpu.utils.sampling import rand_imgs

    rng = np.random.default_rng(3)
    labels = np.array([0, 1, 1, 2, 1, 0])
    pick = rand_imgs(rng, labels, 1, 50)
    assert set(labels[pick]) == {1}
    assert len(pick) == 50              # repeats allowed, like randImg
    with pytest.raises(ValueError):
        rand_imgs(rng, labels, 7, 1)
