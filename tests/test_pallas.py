"""Pallas kernels vs jnp references (interpret mode — runs on CPU)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from tnml_tpu.ops import pallas_kernels as pk

rng = np.random.default_rng(0)


@pytest.mark.parametrize("feature", ["normal", "series"])
@pytest.mark.parametrize("rescale", [1.0, 1 / 255])
def test_phi_featurize_matches_reference(feature, rescale):
    px = rng.integers(0, 256, size=(13, 37)).astype(np.uint8)
    out = pk.phi_featurize(jnp.asarray(px), feature, 2, rescale, interpret=True)
    ref = pk.phi_featurize_reference(px, feature, 2, rescale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-7)
    assert out.shape == (13, 37, 2)


def test_phi_featurize_matches_host_phi():
    """Device featurize == host featurize on readMNIST-normalized pixels."""
    from tnml_tpu.ops.feature import featurize

    px = rng.integers(0, 256, size=(9, 21)).astype(np.uint8)   # [N, B]
    dev = np.asarray(pk.phi_featurize(jnp.asarray(px), "normal", 2, 1.0,
                                      interpret=True))          # [N, B, 2]
    host = featurize(px.T / 255.0, "normal", d=2, rescale=1.0)  # [B, N, 2]
    np.testing.assert_allclose(dev, np.transpose(host, (1, 0, 2)), atol=2e-7)


def test_cg_pass_matches_reference():
    B, AS, TR, L = 300, 16, 16, 10
    Lphi = jnp.asarray(rng.normal(size=(B, AS)), jnp.float32)
    Rphi = jnp.asarray(rng.normal(size=(B, TR)), jnp.float32)
    Bmat = jnp.asarray(rng.normal(size=(AS, L * TR)), jnp.float32)
    sig2 = jnp.asarray(rng.uniform(0.5, 2.0, size=B), jnp.float32)
    pv, ap, pap = pk.cg_pass(Lphi, Rphi, Bmat, sig2, n_labels=L, tb=128,
                             interpret=True)
    pv2, ap2, pap2 = pk.cg_pass_reference(Lphi, Rphi, Bmat, sig2, n_labels=L)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap2),
                               rtol=1e-5, atol=1e-4 * float(jnp.abs(ap2).max()))
    assert float(pap) == pytest.approx(float(pap2), rel=1e-5)


def test_cg_pass_unaligned_batch():
    """Batch padding: B not a multiple of the tile."""
    B, AS, TR, L = 77, 8, 8, 2
    Lphi = jnp.asarray(rng.normal(size=(B, AS)), jnp.float32)
    Rphi = jnp.asarray(rng.normal(size=(B, TR)), jnp.float32)
    Bmat = jnp.asarray(rng.normal(size=(AS, L * TR)), jnp.float32)
    sig2 = jnp.asarray(rng.uniform(0.5, 2.0, size=B), jnp.float32)
    pv, ap, pap = pk.cg_pass(Lphi, Rphi, Bmat, sig2, n_labels=L, tb=64,
                             interpret=True)
    pv2, ap2, pap2 = pk.cg_pass_reference(Lphi, Rphi, Bmat, sig2, n_labels=L)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap2),
                               rtol=1e-5, atol=1e-4 * float(jnp.abs(ap2).max()))
    assert pv.shape == (B, L)


def test_engine_accepts_site_major_device_features():
    """The phi-kernel path: engine consumes [N, B, d] device features directly."""
    from tests.test_engine import make_problem
    from tnml_tpu.mps.pack import pack
    from tnml_tpu.train.engine import SweepEngine
    from tnml_tpu.train.schedule import Sweeps

    W, X, labels = make_problem(n=6, batch=8, label_site=3, seed=1)
    a = SweepEngine(pack(W, pad=8), X, labels, lam=1e-3)
    a.init_envs()
    Xs = jnp.asarray(np.transpose(X, (1, 0, 2)))
    b = SweepEngine(pack(W, pad=8), Xs, labels, lam=1e-3, x_site_major=True)
    b.init_envs()
    ca = float(a.quadcost(0)[0])
    cb = float(b.quadcost(0)[0])
    assert ca == pytest.approx(cb, rel=1e-6)


@pytest.mark.parametrize("J", [10, 1])
def test_cg_solve_kernel_matches_cg_bond(J):
    """The fused full-CG-solve kernel (ops/cg_kernel.py) against bond.cg_bond
    (fast_conj_exact) in interpret mode.  The kernel feeds the MXU bf16
    operands (the headline precision='default' configuration), so the solution
    agrees to bf16 tolerance while the scalar chain (cost0, passes) is f32."""
    from tnml_tpu.ops import cg_kernel
    from tnml_tpu.train import bond as bond_ops

    rng = np.random.default_rng(3)
    B, m, d, npass = 40, 6, 2, 3
    B5 = jnp.asarray(rng.normal(size=(m, d, d, m, J)), jnp.float32) / (m * d)
    LE = jnp.asarray(rng.normal(size=(B, m)), jnp.float32) / np.sqrt(m)
    RE = jnp.asarray(rng.normal(size=(B, m)), jnp.float32) / np.sqrt(m)
    sigL = jnp.asarray(rng.normal(size=B) * 0.1, jnp.float32)
    sigR = jnp.asarray(rng.normal(size=B) * 0.1, jnp.float32)
    xc = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    x1 = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    Y = jnp.asarray(np.eye(J)[rng.integers(0, J, B) % J], jnp.float32)
    lam, cconv = jnp.float32(1e-3), jnp.float32(1e-10)

    ref = bond_ops.cg_bond(B5, LE, sigL, RE, sigR, xc, x1, Y, lam, cconv,
                           npass=npass, fast=True, check_r0=False,
                           fast_exact=True)
    out = cg_kernel.cg_solve(B5, LE, sigL, RE, sigR, xc, x1, Y, lam, cconv,
                             npass=npass, check_r0=False, tb=16,
                             interpret=True)
    B5k, passes, r0, costs, rnorms, cost0, fcost = out
    assert int(passes) == int(ref.passes)
    assert float(cost0) == pytest.approx(float(ref.cost0), rel=2e-3)
    assert float(r0) == pytest.approx(float(ref.r0norm), rel=2e-3)
    assert float(fcost) == pytest.approx(float(ref.est_cost), rel=3e-2)
    scale = float(jnp.max(jnp.abs(ref.B5)))
    err = float(jnp.max(jnp.abs(ref.B5 - B5k))) / scale
    assert err < 5e-2, err
    np.testing.assert_allclose(np.asarray(rnorms), np.asarray(ref.rnorms),
                               rtol=5e-2)
