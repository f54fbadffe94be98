"""Monotone (reject-on-regress) bond acceptance: per-bond cost never increases.

The reference only WARNS when the SVD split regresses the cost (">10% larger C
after SVD", fixedL.cc:523-533); at scale those regressions compound into sweep-
to-sweep oscillation.  ``monotone=True`` generalizes the reference's dormant
`replace` feature (fixedL.cc:512-514) to every layout by re-splitting the
original bond tensor on rejection, which preserves the gauge/label-transport
invariants.  These tests pin:

- per-bond reported cost is non-increasing along the visit order (all engines);
- rejections actually trigger in a truncation-starved regime (tiny maxm);
- with a generous rank budget the monotone engine matches the plain trajectory
  bit-for-bit (acceptance is the identity when nothing regresses).
"""

import numpy as np
import pytest

from tnml_tpu.data.mnist import TRAIN, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel, cold_start
from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
from tnml_tpu.train.schedule import Sweeps


@pytest.fixture(scope="module")
def data():
    ds = read_mnist("/nonexistent-dir", TRAIN, nt=20, size=6, verbose=False)
    X = featurize(ds.images, FEATURE_SERIES, d=2)
    return X, ds.labels


def _run(X, labels, *, label_mode, fused, monotone, maxm=6, pad=8, nsweep=2,
         method="fast_conj_exact"):
    cfg = FixedLConfig(nsweep=nsweep, maxm=maxm, minm=2, cutoff=1e-10, lam=1e-3,
                       npass=3, ninitial=5, pad=pad, label_mode=label_mode,
                       method=method, monotone=monotone)
    w = cold_start(X, labels, ninitial=5, verbose=False)
    eng = FixedLModel(w).make_engine(X, labels, cfg, pad=pad)
    sweeps = Sweeps.constant(nsweep, 2, maxm, 1e-10)
    if fused:
        return eng.run_fused(sweeps, verbose=False)
    eng.init_envs()
    return eng.run(sweeps, verbose=False)


def _assert_monotone(hist):
    costs = [st.cost for st in hist]
    for i in range(len(costs) - 1):
        # slack: bf16-free f32 path; regauge of the old bond is exact up to
        # cutoff truncation and gauge rounding
        assert costs[i + 1] <= costs[i] * (1 + 5e-4) + 1e-6, (
            f"cost increased at visit {i}: {costs[i]} -> {costs[i + 1]}")


@pytest.mark.parametrize("label_mode,fused", [
    ("fixed", True), ("fixed", False), ("moving", True),
])
def test_monotone_cost_and_rejections(data, label_mode, fused):
    X, labels = data
    hist = _run(X, labels, label_mode=label_mode, fused=fused, monotone=True)
    _assert_monotone(hist)
    # the rank-starved regime must actually exercise the reject branch
    assert sum(st.replaced for st in hist) > 0


def test_monotone_identity_when_no_regression(data):
    """With pad == maxm large enough that truncation is lossless, acceptance is
    (numerically) the identity: the trajectory matches the plain engine's.

    Rejections may still fire at fp-level ties (a converged bond where the CG
    improvement is below f32 noise) — those keep the old bond, whose cost is
    equal within noise, so the trajectories stay equivalent."""
    X, labels = data
    h_plain = _run(X, labels, label_mode="moving", fused=True, monotone=False,
                   maxm=24, pad=24, nsweep=1)
    h_mono = _run(X, labels, label_mode="moving", fused=True, monotone=True,
                  maxm=24, pad=24, nsweep=1)
    # rtol: the plain engine reports shifted metrics (the next visit's incoming
    # cost0 — gauge-invariantly the same quantity), the monotone engine an
    # explicit post-split quadcost; the two contraction orders differ at the
    # few-1e-4 level in f32
    np.testing.assert_allclose(
        [st.cost for st in h_mono], [st.cost for st in h_plain],
        rtol=8e-4)


def test_monotone_excludes_replace(data):
    X, labels = data
    cfg = FixedLConfig(nsweep=1, maxm=6, pad=8, monotone=True, replace=True)
    w = cold_start(X, labels, ninitial=5, verbose=False)
    with pytest.raises(ValueError, match="exclusive"):
        FixedLModel(w).make_engine(X, labels, cfg, pad=8)


def test_cg_cost_identity(data):
    """cg_bond's free cost estimates (entry cost + line-search recurrence) match
    measured quadcosts — these feed the per-bond cost_pre report without the
    extra data pass."""
    import jax.numpy as jnp

    from tnml_tpu.mps.pack import pack
    from tnml_tpu.train import bond as bond_ops
    from tnml_tpu.train.env import edge_env, env_extend

    X, labels = data
    w = cold_start(X, labels, ninitial=5, verbose=False)
    w.move_label(0, cutoff=1e-12, maxm=8)
    pm = pack(w, 8)
    nt, n = X.shape[0], X.shape[1]
    import jax
    Y = jnp.asarray(jax.nn.one_hot(labels, 10), jnp.float32)
    xs = jnp.asarray(np.transpose(X, (1, 2, 0)), jnp.float32)
    # right wing at bond 0 covering sites 2..N-1
    prev = edge_env(nt, 8, jnp.float32)
    for j in range(n - 1, 1, -1):
        prev = env_extend(prev[0], prev[1], xs[j], pm.cores[j], fromleft=False)
    le = edge_env(nt, 8, jnp.float32)
    B5 = bond_ops.make_bond(pm.cores[0], pm.cores[1])
    lam = jnp.float32(1e-3)
    for method, fast, fast_exact in (("conj", False, False),
                                     ("fast_conj_exact", True, True)):
        cg = bond_ops.cg_bond(B5, le[0], le[1], prev[0], prev[1], xs[0], xs[1],
                              Y, lam, 1e-10, npass=3, fast=fast,
                              fast_exact=fast_exact)
        c0_meas = bond_ops.quadcost(B5, le[0], le[1], prev[0], prev[1], xs[0],
                                    xs[1], Y, jnp.asarray(labels), lam)[0]
        cN_meas = bond_ops.quadcost(cg.B5, le[0], le[1], prev[0], prev[1],
                                    xs[0], xs[1], Y, jnp.asarray(labels), lam)[0]
        np.testing.assert_allclose(float(cg.cost0), float(c0_meas), rtol=1e-5)
        np.testing.assert_allclose(float(cg.est_cost), float(cN_meas),
                                   rtol=1e-3, err_msg=method)
