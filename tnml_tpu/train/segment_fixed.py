"""Scan-fused half-sweeps for the FIXED-label layout (the reference's flagship mode).

The moving-label fused engine (train/segment.py) relies on every bond having the same
shape.  With the label index pinned to the central core c = N/2 (fixedL.cc:616), the
chain instead has three uniform regions per half-sweep:

    seg A   bonds 0..c-2     active pair plain,  far wing carries the label (K=10)
    center  bonds c-1, c     the label core itself is one of the active pair
    seg B   bonds c+1..N-2   active pair plain,  near wing carries the label (K=10)

Each segment folds into one ``lax.fori_loop`` over ``fused_bond_step``-equivalent
bodies (CG + truncated split + env shift per bond); the two center bonds run as the
existing per-bond fused step.  A full half-sweep is therefore 4 device calls instead
of N-1.

**Ping-pong buffers.**  Exactly as in segment.py, all stacks are bond-aligned and each
bond's step emits its carry-in near wing — which is by construction the far wing the
opposite direction reads at the same bond (TrainStates::shiftE invariant,
fixedL.cc:192-233).  Because wing shapes differ by region, the emissions split into
two buffers:

- ``plain``   [N-1, B, m]    rows 0..c:     left  wings at bonds 0..c   (fwd emits)
                             rows c-1..N-2: right wings at bonds c-1..N-2 (bwd emits)
  (rows c-1, c are written by the center steps of one direction and read by the
  center steps of the other)
- ``labeled`` [R, B, 10, m]  R = max(c-1, N-1-c); row r:
                             fwd seg A reads r = bond (right wings covering c),
                             fwd seg B writes r = bond-(c+1) (left wings covering c);
                             the backward half mirrors the roles.
  The two row ranges of one direction are disjoint in time (seg A fully consumes its
  rows before seg B starts writing), so ONE donated buffer alternates meaning — the
  10x-wide label wings exist exactly once in HBM.

Memory: labeled buffer ~ (N/2)·B·10·m; at B=10k/m=120/bf16 that is ~9 GB (fits one
chip); the full 58,862-image set needs the checkpointed rebuild variant (keep_every>1,
see fixed_half_sweep) which stores every K-th labeled row and rebuilds blocks on the
fly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tnml_tpu.train import bond as bond_ops
from tnml_tpu.train import step as step_ops
from tnml_tpu.train.env import env_extend, unsqueeze_env


def _edge(nb, pad, dtype):
    return (jnp.zeros((nb, pad), dtype or jnp.float32).at[:, 0].set(1.0),
            jnp.zeros((nb,), jnp.float32))


class SegResult(NamedTuple):
    cores_st: jnp.ndarray    # [N, pad, d, pad] site-aligned plain cores (row c dead)
    cur_core: jnp.ndarray    # [pad, d, pad] travelling core leaving the segment
    near_arr: jnp.ndarray    # [B, (10,) m] near wing leaving the segment
    near_sig: jnp.ndarray
    emit_buf: jnp.ndarray    # the donated emission buffer, rows filled
    emit_sig: jnp.ndarray
    stats: jnp.ndarray       # [T, stats_len] rows in bond order (t0..t0+T-1)


@partial(jax.jit,
         static_argnames=("t0", "T", "far_off", "emit_off", "forward", "method",
                          "npass", "report", "env_dtype", "mxu_dtype",
                          "svd_method", "damp", "monotone", "shift_report",
                          "nl"),
         donate_argnums=(0, 5, 6))
def fixed_segment(cores_st,               # [N, pad, d, pad] donated
                  cur_core,               # [pad, d, pad]
                  near_arr, near_sig,     # [B,(10,)m], [B]
                  far_buf,                # [Rf, B, (10,) m] read-only
                  emit_buf, emit_sig,     # [Re, B, (10,) m], [Re, B] donated
                  far_sig,                # [Rf, B] read-only
                  xs,                     # [N, d, B]
                  Y, labels, hyp_f, hyp_i,
                  t0: int, T: int, far_off: int, emit_off: int,
                  forward: bool, method: str, npass: int,
                  report: bool, env_dtype=None, mxu_dtype=None,
                  svd_method: str = "gram", damp: bool = False,
                  monotone: bool = False,
                  shift_report: bool = False, nl: int = 10) -> SegResult:
    """Scan bonds t0..t0+T-1 (forward) or reversed, all label-free active pairs.

    Per bond t: far wing = far_buf[t - far_off]; absorbed core = cores_st
    site t+1 (fwd) / t (bwd); emission (the carry-in near wing) overwrites
    emit_buf[t - emit_off].  ``fast`` CG recurrences per bond.cg_bond.
    """
    lam, cconv, cutoff = hyp_f[0], hyp_f[1], hyp_f[2]
    maxm, minm = hyp_i[0], hyp_i[1]
    npass_len = step_ops.stats_len(npass, nl)

    def body(i, st):
        cores_st, cur, n_arr, n_sig, emit_buf, emit_sig, stats_st = st
        t = (t0 + i) if forward else (t0 + T - 1 - i)
        far_a = lax.dynamic_index_in_dim(far_buf, t - far_off, keepdims=False)
        far_s = lax.dynamic_index_in_dim(far_sig, t - far_off, keepdims=False)
        site_absorb = (t + 1) if forward else t
        w_next = lax.dynamic_index_in_dim(cores_st, site_absorb, keepdims=False)
        xl = lax.dynamic_index_in_dim(xs, t, keepdims=False)
        xr = lax.dynamic_index_in_dim(xs, t + 1, keepdims=False)
        fixed_core, nxt, new, stats = plain_bond_body(
            cur, w_next, far_a, far_s, n_arr, n_sig, xl, xr, Y, labels,
            hyp_f, hyp_i, forward=forward, method=method, npass=npass,
            report=report, mxu_dtype=mxu_dtype, svd_method=svd_method,
            damp=damp, monotone=monotone, shift_report=shift_report, nl=nl)
        site_fix = t if forward else t + 1

        # emit the carry-in near wing (the opposite direction's far wing at t)
        emit_buf = lax.dynamic_update_index_in_dim(
            emit_buf, n_arr.astype(emit_buf.dtype), t - emit_off, 0)
        emit_sig = lax.dynamic_update_index_in_dim(emit_sig, n_sig,
                                                   t - emit_off, 0)
        cores_st = lax.dynamic_update_index_in_dim(cores_st, fixed_core,
                                                   site_fix, 0)
        stats_st = lax.dynamic_update_index_in_dim(stats_st, stats, i, 0)
        return (cores_st, nxt, new[0], new[1], emit_buf, emit_sig, stats_st)

    stats0 = jnp.zeros((T, npass_len), jnp.float32)
    init = (cores_st, cur_core, near_arr, near_sig, emit_buf, emit_sig, stats0)
    out = lax.fori_loop(0, T, body, init)
    cores_st, cur, n_arr, n_sig, emit_buf, emit_sig, stats_st = out
    if not forward:
        stats_st = stats_st[::-1]   # rows in bond order t0..t0+T-1
    return SegResult(cores_st, cur, n_arr, n_sig, emit_buf, emit_sig, stats_st)


def plain_bond_body(cur, w_next, far_a, far_s, n_arr, n_sig, xl, xr, Y, labels,
                    hyp_f, hyp_i, *, forward: bool, method: str, npass: int,
                    report: bool, mxu_dtype=None, svd_method: str = "gram",
                    damp: bool = False, monotone: bool = False,
                    shift_report: bool = False, nl: int = 10):
    """One label-free active-pair bond step (trace-time helper, shared by
    fixed_segment and segment_blocked): CG + truncated split + metrics + env
    shift.  ``cur`` is the travelling core, ``w_next`` the absorbed core,
    ``n_arr/n_sig`` the near wing, ``far_a/far_s`` the far wing.  Returns
    (fixed_core, next_travelling_core, (new_near_arr, new_near_sig), stats)."""
    lam, cconv, cutoff = hyp_f[0], hyp_f[1], hyp_f[2]
    maxm, minm = hyp_i[0], hyp_i[1]
    if forward:
        wl, wr = cur, w_next
        LE, lsc, RE, rsc = n_arr, n_sig, far_a, far_s
    else:
        wl, wr = w_next, cur
        LE, lsc, RE, rsc = far_a, far_s, n_arr, n_sig

    B5 = bond_ops.make_bond(wl, wr)
    cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xl, xr, Y, lam, cconv,
                          npass=npass, fast=method.startswith("fast"),
                          check_r0=False, mxu_dtype=mxu_dtype,
                          fast_exact=(method == "fast_conj_exact"),
                          labels=labels,
                          metrics=((shift_report or monotone) and report),
                          nl=nl,
                          # measured default: unrolled CG drops the final dead
                          # outer_grad (.bench/r5_unroll.log: -5.6% s/sweep)
                          unroll=bond_ops.resolve_unroll(True))
    if damp:
        alpha = hyp_f[5]
        cg = cg._replace(B5=alpha * cg.B5 + (1.0 - alpha) * B5)
    nwl, nwr, rank, truncerr = bond_ops.split_bond(
        cg.B5, cutoff, maxm, minm, label_leg="none", iso_left=forward,
        method=svd_method)

    # pre-split cost: free via the CG line-search identity for the exact
    # recurrences; a data pass otherwise (see step.py)
    est_pre = method in ("conj", "fast_conj_exact") and not damp

    def pre_split_cost():
        if est_pre:
            return cg.est_cost
        return bond_ops.quadcost(cg.B5, LE, lsc, RE, rsc, xl, xr, Y,
                                 labels, lam, mxu_dtype=mxu_dtype,
                                 nl=nl)[0]

    rejected = jnp.bool_(False)
    aux = jnp.float32(0.0)
    if monotone and shift_report:
        # gated acceptance (bond.monotone_accept_gated): in the fixed layout
        # the old bond's re-split along the unchanged partition never
        # truncates (rank <= inner dim <= maxm), so the reject candidate's
        # pass is ALWAYS skipped; the accept candidate measures only at
        # rank-saturated bonds.  Metrics slots carry INCOMING values for the
        # engine's shift.
        if not est_pre:
            raise ValueError("gated monotone needs conj/fast_conj_exact "
                             "without damping")
        (nwl, nwr, rank, truncerr, rejected, _cost_sel,
         aux) = bond_ops.monotone_accept_gated(
            B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xl, xr, Y,
            labels, lam, cutoff, maxm, minm, "none", forward,
            svd_method, cost0=cg.cost0, est_cost=cg.est_cost,
            mxu_dtype=mxu_dtype, nl=nl)
        cost, per_label, ncor, reg = cg.cost0, cg.pl0, cg.ncor0, cg.reg0
        cost_pre = cg.est_cost
    elif monotone:
        (nwl, nwr, rank, truncerr, cost, per_label, ncor,
         reg, rejected, aux) = bond_ops.monotone_accept(
            B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xl, xr, Y,
            labels, lam, cutoff, maxm, minm, "none", forward,
            svd_method, mxu_dtype=mxu_dtype, nl=nl)
        cost_pre = pre_split_cost() if report else jnp.float32(jnp.nan)
    elif report and shift_report:
        # shifted reporting (step.py): slots carry the INCOMING metrics,
        # free off the CG gradient pass; the engine shifts one visit back
        cost, per_label, ncor, reg = cg.cost0, cg.pl0, cg.ncor0, cg.reg0
        cost_pre = pre_split_cost()
    elif report:
        newB = bond_ops.make_bond(nwl, nwr)
        cost, per_label, ncor, reg = bond_ops.quadcost(
            newB, LE, lsc, RE, rsc, xl, xr, Y, labels, lam,
            mxu_dtype=mxu_dtype, nl=nl)
        cost_pre = pre_split_cost()
    else:
        cost = jnp.float32(jnp.nan)
        cost_pre = jnp.float32(jnp.nan)
        per_label = jnp.zeros((nl,), jnp.float32)
        ncor, reg = jnp.int32(-1), jnp.float32(0.0)

    if forward:
        fixed_core, nxt = nwl, nwr
        new = env_extend(n_arr, n_sig, xl, nwl, fromleft=True)
    else:
        fixed_core, nxt = nwr, nwl
        new = env_extend(n_arr, n_sig, xr, nwr, fromleft=False)

    stats = jnp.zeros((step_ops.stats_len(npass, nl),), jnp.float32)
    stats = stats.at[step_ops.S_AUX].set(aux)
    stats = stats.at[step_ops.S_REPLACED].set(rejected.astype(jnp.float32))
    stats = stats.at[step_ops.S_RANK].set(rank.astype(jnp.float32))
    stats = stats.at[step_ops.S_TRUNCERR].set(truncerr)
    stats = stats.at[step_ops.S_COST].set(cost)
    stats = stats.at[step_ops.S_NCOR].set(ncor.astype(jnp.float32))
    stats = stats.at[step_ops.S_REG].set(reg)
    stats = stats.at[step_ops.S_R0].set(cg.r0norm)
    stats = stats.at[step_ops.S_PASSES].set(cg.passes.astype(jnp.float32))
    stats = stats.at[step_ops.S_COST_PRE].set(cost_pre)
    stats = lax.dynamic_update_slice(stats, per_label, (step_ops.S_PER_LABEL,))
    stats = lax.dynamic_update_slice(stats, cg.costs, (step_ops.s_cg(nl),))
    stats = lax.dynamic_update_slice(stats, cg.rnorms,
                                     (step_ops.s_cg(nl) + npass,))
    return fixed_core, nxt, new, stats


@partial(jax.jit,
         static_argnames=("t", "label_leg", "forward", "method", "npass",
                          "report", "env_dtype", "mxu_dtype", "svd_method",
                          "damp", "monotone", "shift_report", "nl"),
         donate_argnums=(4, 5))
def center_step(wl, wr, near_arr, near_sig, plain_buf, plain_sig,
                xl, xr, Y, labels, hyp_f, hyp_i,
                t: int, label_leg: str, forward: bool, method: str, npass: int,
                report: bool, env_dtype=None, mxu_dtype=None,
                svd_method: str = "gram", damp: bool = False,
                monotone: bool = False, shift_report: bool = False,
                nl: int = 10):
    """One of the two label-core bonds (c-1, c): a fused_bond_step whose far wing
    comes from plain_buf[t] and whose emission overwrites the same row in place
    (donated)."""
    far_a = plain_buf[t]
    far_s = plain_sig[t]
    if forward:
        LE, lsc, RE, rsc = near_arr, near_sig, far_a, far_s
    else:
        LE, lsc, RE, rsc = far_a, far_s, near_arr, near_sig
    key = jnp.zeros((1,), jnp.uint32)
    # env_dtype=None: the shifted wing feeds the next segment's f32 CARRY
    # (stored buffer rows quantize at the .at[t].set below)
    nwl, nwr, env_arr, env_sig, stats = step_ops.fused_bond_step(
        wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, key,
        label_leg=label_leg, iso_left=forward, method=method, npass=npass,
        check_r0=False, report=report, use_noise=False,
        env_dtype=None, mxu_dtype=mxu_dtype, svd_method=svd_method,
        replace=False, damp=damp, monotone=monotone,
        shift_report=shift_report, nl=nl)
    plain_buf = plain_buf.at[t].set(near_arr.astype(plain_buf.dtype))
    plain_sig = plain_sig.at[t].set(near_sig)
    return nwl, nwr, env_arr, env_sig, plain_buf, plain_sig, stats


@partial(jax.jit, static_argnames=("nb", "c", "env_dtype"))
def init_fixed_wings(cores_st, label_core, xs, nb: int, c: int, env_dtype=None):
    """Initial right-wing stacks for the fixed-label fused engine
    (TrainStates::init, fixedL.cc:122-157).

    Returns (labeled_buf [R,B,10,m], labeled_sig, plain_buf [N-1,B,m], plain_sig).
    The far wing at bond t is the right wing covering sites t+2..N-1 — it lands in
    plain row t for t >= c-1, labeled row t for t <= c-2.  Rows the first forward
    half-sweep never reads stay zero (ping-pong fills them).
    """
    n = cores_st.shape[0]
    pad = cores_st.shape[1]
    R = max(c - 1, n - 2 - c)
    dt = env_dtype or jnp.float32

    def extend_emit(cr, inp):
        core, x = inp
        # f32 carry; emitted rows quantize ONCE (per-site re-quantization
        # compounds bf16 rounding over the chain — see segment.init_right_wings)
        out = env_extend(cr[0], cr[1], x, core, fromleft=False)
        return out, (out[0].astype(dt), out[1])

    # plain wings: extend over sites N-1 down to c+1; the wing covering site j..
    # is the far wing at bond j-2 -> rows c-1..N-3; row N-2 is the edge.
    carry = _edge(nb, pad, None)
    lab_gate, (pe, ps) = lax.scan(extend_emit, carry,
                                  (cores_st[c + 1:], xs[c + 1:]), reverse=True)
    plain_buf = jnp.zeros((n - 1, nb, pad), dt)
    plain_sig = jnp.zeros((n - 1, nb), jnp.float32)
    plain_buf = plain_buf.at[n - 2].set(_edge(nb, pad, env_dtype)[0].astype(dt))
    plain_buf = lax.dynamic_update_slice(plain_buf, pe.astype(dt), (c - 1, 0, 0))
    plain_sig = lax.dynamic_update_slice(plain_sig, ps, (c - 1, 0))

    # cross the label core (site c): wing covering c.. = far wing at bond c-2
    lab = env_extend(lab_gate[0], lab_gate[1], xs[c], label_core,
                     fromleft=False)
    labeled_buf = jnp.zeros((R, nb, label_core.shape[-1], pad), dt)
    labeled_sig = jnp.zeros((R, nb), jnp.float32)
    labeled_buf = labeled_buf.at[c - 2].set(unsqueeze_env(lab[0]).astype(dt))
    labeled_sig = labeled_sig.at[c - 2].set(lab[1])

    # labeled wings: sites c-1 down to 2 -> far wings at bonds c-3..0
    if c > 2:
        _, (le, ls) = lax.scan(extend_emit, lab, (cores_st[2:c], xs[2:c]),
                               reverse=True)
        labeled_buf = lax.dynamic_update_slice(labeled_buf, le.astype(dt),
                                               (0, 0, 0, 0))
        labeled_sig = lax.dynamic_update_slice(labeled_sig, ls, (0, 0))
    return labeled_buf, labeled_sig, plain_buf, plain_sig
