"""Fixed-label scan-fused half-sweeps vs the per-bond engine (same algorithm, so
the per-bond trajectories must agree to float tolerance)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps

from tests.test_engine import make_problem


def _pair(n, batch, c, seed, **kw):
    W, X, labels = make_problem(n=n, batch=batch, label_site=c, seed=seed)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    pad = max(16, W.max_bond())
    a = SweepEngine(pack(W, pad=pad), X, labels, label_mode="fixed", **kw)
    b = SweepEngine(pack(W, pad=pad), X, labels, label_mode="fixed", **kw)
    return a, b, X, labels


def _compare(a, b, sweeps, X):
    a.init_envs()
    ha = a.run(sweeps, verbose=False)
    hb = b.run_fused(sweeps, verbose=False)
    assert [(s.b, s.direction) for s in ha] == [(s.b, s.direction) for s in hb]
    ca = np.array([s.cost for s in ha])
    cb = np.array([s.cost for s in hb])
    np.testing.assert_allclose(ca, cb, rtol=2e-2, atol=1e-4)
    ra = np.array([s.newm for s in ha])
    rb = np.array([s.newm for s in hb])
    assert (ra == rb).mean() > 0.9   # rank ties can flip on float noise
    Wa, Wb = unpack(a.packed()), unpack(b.packed())
    assert Wa.label_site == Wb.label_site
    for i in range(min(4, X.shape[0])):
        np.testing.assert_allclose(evaluate_mps(Wa, X[i]),
                                   evaluate_mps(Wb, X[i]),
                                   rtol=5e-2, atol=1e-3)


def test_fused_fixed_matches_perbond():
    a, b, X, labels = _pair(n=10, batch=14, c=4, seed=3, lam=1e-4, npass=3)
    _compare(a, b, Sweeps.constant(2, 2, 10, 1e-10), X)


def test_fused_fixed_off_center_label():
    # label away from the exact center exercises unequal segment lengths
    a, b, X, labels = _pair(n=9, batch=10, c=6, seed=4, lam=1e-3, npass=2,
                            method="fast_conj_exact")
    _compare(a, b, Sweeps.constant(2, 2, 8, 1e-10), X)


def test_fused_fixed_smallest_center():
    a, b, X, labels = _pair(n=6, batch=8, c=2, seed=5, lam=1e-3, npass=2)
    _compare(a, b, Sweeps.constant(1, 2, 8, 1e-10), X)


def test_fused_fixed_learns():
    # separable toy signal: fused fixed-label training should reduce cost
    W, X, labels = make_problem(n=8, batch=30, label_site=3, seed=6)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    for l in range(10):
        X[labels == l, l % 8] = [np.cos(0.1 + l * 0.15), np.sin(0.1 + l * 0.15)]
    eng = SweepEngine(pack(W, pad=16), X, labels, lam=1e-3, npass=3,
                      label_mode="fixed")
    h = eng.run_fused(Sweeps.constant(4, 2, 12, 1e-9), verbose=False)
    assert h[-1].cost < 0.6 * h[0].cost
    assert h[-1].ncorrect > h[0].ncorrect


def test_hbm_model_v5e8_full_mnist():
    """The per-chip memory model behind BASELINE.md's pod-scale row: full MNIST
    on a v5e-8 (16 GB HBM/chip) fits in BOTH label modes with bf16 wings."""
    from tnml_tpu.parallel.mesh import estimate_hbm

    for mode in ("moving", "fixed"):
        est = estimate_hbm(58862, 784, 120, env_bytes=2, n_chips=8,
                           label_mode=mode)
        assert est["total"] < 16e9, (mode, est)
    # and the documented single-chip situation: moving fits, fixed does not
    assert estimate_hbm(58862, 784, 120, env_bytes=2, n_chips=1,
                        label_mode="moving")["total"] < 16e9
    assert estimate_hbm(58862, 784, 120, env_bytes=2, n_chips=1,
                        label_mode="fixed")["total"] > 16e9


def test_fused_fixed_model_layer_dispatch():
    """FixedLModel.train picks the fused engine when the buffer fits, and the
    per-bond engine when TNML_FUSED_FIXED_MAX_BYTES forbids it."""
    import os
    from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel

    W, X, labels = make_problem(n=8, batch=10, label_site=3, seed=7)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    cfg = FixedLConfig(nsweep=1, maxm=8, cutoff=1e-10, lam=1e-3, npass=2,
                       pad=8, report_cost=True)
    m1 = FixedLModel(W.copy())
    eng = m1.make_engine(X, labels, cfg)
    assert m1._use_fused(eng, cfg, verbose=False)
    os.environ["TNML_FUSED_FIXED_MAX_BYTES"] = "10"
    try:
        assert not m1._use_fused(eng, cfg, verbose=False)
    finally:
        del os.environ["TNML_FUSED_FIXED_MAX_BYTES"]
    h = m1.train(X, labels, cfg, workdir=None, verbose=False)
    assert len(h) == 2 * (8 - 1)
