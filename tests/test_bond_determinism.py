"""Single-bond determinism: the fused-segment bond body vs the per-bond step.

VERDICT r2 weakness #6: the fused-vs-per-bond trajectory tests run at rtol=2e-2
(rank ties), which could hide a small systematic divergence between the engines.
This closes the hole at the source: segment_fixed.plain_bond_body (the body both
fixed fused engines scan over) and step.fused_bond_step (the per-bond engine's
kernel) are fed byte-identical inputs and must produce matching cores, shifted
wing, and stats vector — same math, same op order, so the agreement is at
float-roundoff level (not trajectory level), and any systematic divergence
between the engines fails loudly.
"""

import numpy as np
import jax.numpy as jnp

import tests.conftest  # noqa: F401

from tnml_tpu.train import step as step_ops
from tnml_tpu.train.segment_fixed import plain_bond_body


def _inputs(seed, B=12, pad=8, d=2, nl=10, npass=3, forward=True):
    """Random bond inputs in the fixed-layout shape: both active cores plain,
    the FAR wing carrying the label axis (the segment A/B situation)."""
    rng = np.random.default_rng(seed)
    wl = jnp.asarray(rng.normal(size=(pad, d, pad)) / pad, jnp.float32)
    wr = jnp.asarray(rng.normal(size=(pad, d, pad)) / pad, jnp.float32)
    if forward:   # near = LE plain, far = RE labelled
        LE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
        RE = jnp.asarray(rng.normal(size=(B, nl, pad)), jnp.float32)
    else:
        LE = jnp.asarray(rng.normal(size=(B, nl, pad)), jnp.float32)
        RE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
    lsc = jnp.asarray(rng.normal(size=(B,)) * 0.1, jnp.float32)
    rsc = jnp.asarray(rng.normal(size=(B,)) * 0.1, jnp.float32)
    xl = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nl, size=B), jnp.int32)
    Y = jnp.eye(nl, dtype=jnp.float32)[labels]
    hyp_f = jnp.asarray([1e-3, 1e-10, 1e-10, 1e-8, 0.0, 1.0], jnp.float32)
    hyp_i = jnp.asarray([pad, 2, 10], jnp.int32)
    return wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, npass, nl


def _run_both(seed, forward, method, shift_report, npass=3):
    (wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, npass, nl) = \
        _inputs(seed, npass=npass, forward=forward)
    if forward:
        cur, w_next = wl, wr
        n_arr, n_sig, far_a, far_s = LE, lsc, RE, rsc
    else:
        cur, w_next = wr, wl
        n_arr, n_sig, far_a, far_s = RE, rsc, LE, lsc
    fixed_core, nxt, (na, ns), stats_seg = plain_bond_body(
        cur, w_next, far_a, far_s, n_arr, n_sig, xl, xr, Y, labels,
        hyp_f, hyp_i, forward=forward, method=method, npass=npass,
        report=True, shift_report=shift_report, nl=nl)
    key = jnp.zeros((1,), jnp.uint32)
    nwl, nwr, env_arr, env_sig, stats_step = step_ops.fused_bond_step(
        wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, key,
        label_leg="none", iso_left=forward, method=method, npass=npass,
        check_r0=False, report=True, shift_report=shift_report, nl=nl)
    if forward:
        seg_cores = (fixed_core, nxt)
    else:
        seg_cores = (nxt, fixed_core)
    return (seg_cores, (na, ns), stats_seg), \
           ((nwl, nwr), (env_arr, env_sig), stats_step)


def _assert_same(a, b):
    (ca, wa, sa), (cb, wb, sb) = a, b
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb),
                                  err_msg="stats vector diverged")
    for x, y in zip(ca, cb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg="split cores diverged")
    np.testing.assert_array_equal(np.asarray(wa[0]), np.asarray(wb[0]),
                                  err_msg="shifted wing diverged")
    np.testing.assert_array_equal(np.asarray(wa[1]), np.asarray(wb[1]),
                                  err_msg="wing log-scale diverged")


def test_body_matches_step_forward():
    _assert_same(*_run_both(0, True, "conj", False))


def test_body_matches_step_backward():
    _assert_same(*_run_both(1, False, "conj", False))


def test_body_matches_step_shift_report():
    _assert_same(*_run_both(2, True, "conj", True))
    _assert_same(*_run_both(3, False, "fast_conj_exact", True))


def test_body_matches_step_fast():
    _assert_same(*_run_both(4, True, "fast_conj", False))


def test_unrolled_cg_matches_while_loop():
    """The statically unrolled CG (round-5, layout-gated default) must follow
    the while_loop trajectory: bit-identical for 'conj' (the tail branch is
    identical code), last-ulp-level for the fast paths (XLA fuses across
    unrolled iterations), and IDENTICAL pass counts / early-exit behavior."""
    from tnml_tpu.train import bond as bond_ops

    rng = np.random.default_rng(7)
    B, pad, d, nl = 16, 8, 2, 10
    B5 = jnp.asarray(rng.normal(size=(pad, d, d, pad, nl)), jnp.float32)
    LE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
    RE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
    lsc = jnp.asarray(rng.normal(size=(B,)) * 0.01, jnp.float32)
    rsc = jnp.asarray(rng.normal(size=(B,)) * 0.01, jnp.float32)
    xl = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nl, size=B), jnp.int32)
    Y = jnp.eye(nl, dtype=jnp.float32)[labels]

    # cconv=2e3 exercises the masked early exit: CG at these shapes converges
    # below that within a couple of passes (asserted via matching pass counts)
    for fast, fe, cconv in [(False, False, 0.0), (True, False, 0.0),
                            (True, True, 0.0), (False, False, 2e3),
                            (True, True, 2e3)]:
        out = {}
        for unroll in (True, False):
            out[unroll] = bond_ops.cg_bond(
                B5, LE, lsc, RE, rsc, xl, xr, Y, jnp.float32(1e-3),
                jnp.float32(cconv), npass=4, fast=fast, fast_exact=fe,
                check_r0=True, labels=labels, metrics=True, nl=nl,
                unroll=unroll)
        a, b = out[True], out[False]
        assert int(a.passes) == int(b.passes)
        if cconv > 0:
            assert int(a.passes) < 4, "early exit not exercised"
        if not fast:
            np.testing.assert_array_equal(np.asarray(a.B5), np.asarray(b.B5))
        else:
            np.testing.assert_allclose(np.asarray(a.B5), np.asarray(b.B5),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.rnorms), np.asarray(b.rnorms),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(a.est_cost), float(b.est_cost),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.cost0), np.asarray(b.cost0))
