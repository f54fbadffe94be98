"""Direct solvers (exact/pinv) and the DMRG noise-term split (single.h parity)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.mps.ops import evaluate_mps
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps

from tests.test_engine import make_problem


def make_single_problem(n=6, batch=24, seed=7):
    W, X, labels = make_problem(n=n, batch=batch, label_site=None, seed=seed)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    X[labels == 3, 0] = [0.9, np.sqrt(1 - 0.81)]
    return W, X, labels


@pytest.mark.parametrize("method", ["exact", "pinv"])
def test_direct_methods_train(method):
    W, X, labels = make_single_problem()
    eng = SweepEngine(pack(W, pad=6), X, labels, lam=1e-4, npass=6,
                      target_label=3, method=method, ntarget=8)
    eng.init_envs()
    hist = eng.run(Sweeps.constant(2, 2, 6, 1e-10), verbose=False)
    assert hist[-1].cost < 0.5  # well below the ~3.0 do-nothing cost
    if method == "pinv":
        # pinv reports its sketched-solution cost in aux (single.h:600-601)
        assert hist[-1].aux > 0.0


def test_exact_matches_dense_ridge():
    """One exact bond step == dense ridge solution of the same least squares."""
    from tnml_tpu.train import bond as bond_ops, solvers

    W, X, labels = make_single_problem(batch=30)
    lam = 1e-3
    eng = SweepEngine(pack(W, pad=6), X, labels, lam=lam, target_label=3,
                      method="exact")
    eng.init_envs()
    B5 = eng.bond_tensor(0)
    le, re = eng._le(0), eng._re(0)
    y = np.asarray(eng.Y)[:, 0]

    Bex = solvers.exact_solve(B5, le[0], le[1], re[0], re[1],
                              eng.Xsites[0], eng.Xsites[1],
                              jnp.asarray(y), jnp.float32(lam), jnp.float32(1e-10))
    Xv = np.asarray(solvers._design_matrix(B5, le[0], le[1], re[0], re[1],
                                           eng.Xsites[0], eng.Xsites[1]),
                    dtype=np.float64)
    # dense ridge via SVD with the same s/(s^2+lam) filter
    U, s, Vt = np.linalg.svd(Xv, full_matrices=False)
    Bstar = Vt.T @ ((s / (s * s + lam)) * (U.T @ y))
    np.testing.assert_allclose(np.asarray(Bex).reshape(-1), Bstar,
                               rtol=2e-2, atol=2e-4)


def test_noise_split_trains_and_grows_rank():
    """noise>0 uses the density-matrix update; training still converges."""
    W, X, labels = make_single_problem(batch=20)
    eng = SweepEngine(pack(W, pad=8), X, labels, lam=1e-4, npass=4,
                      target_label=3, method="conj")
    eng.init_envs()
    sweeps = Sweeps.constant(3, 2, 8, 1e-9, noise=1e-6)
    hist = eng.run(sweeps, verbose=False)
    assert hist[-1].cost < 0.6
    # outputs sane on the trained model
    W2 = unpack(eng.packed())
    outs = np.array([float(evaluate_mps(W2, X[i])) for i in range(X.shape[0])])
    assert np.isfinite(outs).all()


def test_noise_split_matches_svd_when_zero_noise():
    """noise -> 0 density-matrix update spans the same subspace as plain SVD."""
    from tnml_tpu.train import bond as bond_ops, solvers

    rng = np.random.default_rng(0)
    pad, d = 5, 2
    B5 = jnp.asarray(rng.normal(size=(pad, d, d, pad, 1)), jnp.float32)
    env = jnp.asarray(rng.normal(size=(4, 1, pad)), jnp.float32)
    sig = jnp.zeros((4,), jnp.float32)
    wl_n, wr_n, rk_n, te_n = solvers.noise_split(
        B5, env, sig, jnp.float32(1e-9), jnp.int32(4), jnp.int32(1),
        jnp.float32(0.0), iso_left=True)
    wl_s, wr_s, rk_s, te_s = bond_ops.split_bond(
        B5, jnp.float32(1e-9), jnp.int32(4), jnp.int32(1),
        label_leg="none", iso_left=True)
    assert int(rk_n) == int(rk_s)
    # same reconstruction
    rec_n = np.einsum("asm,mtr->astr", np.asarray(wl_n), np.asarray(wr_n))
    rec_s = np.einsum("asm,mtr->astr", np.asarray(wl_s), np.asarray(wr_s))
    np.testing.assert_allclose(rec_n, rec_s, atol=2e-4)


def test_method_validation():
    W, X, labels = make_problem(n=6, batch=4, label_site=3)
    with pytest.raises(ValueError, match="label-free"):
        SweepEngine(pack(W, pad=8), X, labels, method="exact")
    with pytest.raises(ValueError, match="not recognized"):
        SweepEngine(pack(W, pad=8), X, labels, method="sgd")
