"""Scan-fused half-sweeps: one jitted ``lax.scan`` call per half-sweep.

The per-bond engine enqueues one device call per bond; through a networked TPU each
call carries ~1-1.5 ms of fixed overhead — comparable to the bond's compute.  For
model families whose bond structure is uniform along the chain (the moving-label
fixedL mode and the label-free `single` family: the label rides ON the active pair,
every wing stays thin), the whole half-sweep folds into a single ``lax.scan``.

**Bond-aligned buffers, zero reassembly.**  All stacked arrays are indexed by BOND
(row t <-> bond t = sites (t, t+1)), never by visit order:

- a backward half-sweep is ``lax.scan(..., reverse=True)`` over the same rows;
- each step emits the CARRY-IN wing — which is by construction exactly the wing the
  opposite-direction half-sweep must read at the same bond (the reference invariant:
  ha=1 bond b reads the env written by ha=2 bond b+1 and vice versa,
  fixedL.cc:192-233), so the ys of one half-sweep is directly the xs of the next;
- each step emits the finalized (label-free) core of the pair, which is exactly the
  not-yet-touched core the opposite direction absorbs at the same bond;
- the chain-edge wings fall out of the carry initialization (bond 0's carry-in IS the
  edge; it round-trips as a stored row and stays correct).

The engine therefore ping-pongs four stacked buffers between exactly two device calls
per sweep with no concatenates, reversals, or per-site dicts — at 60k images a single
11 GB wing stack, never two.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tnml_tpu.train import bond as bond_ops
from tnml_tpu.train import step as step_ops
from tnml_tpu.train.env import env_extend


class HalfSweepResult(NamedTuple):
    cores: jnp.ndarray        # [n_bonds, pad, d, pad]: row t = finalized core of
                              # bond t (site t fwd / site t+1 bwd) — directly the
                              # next half-sweep's `next_cores`
    carry_core: jnp.ndarray   # [pad, d, pad, J] the travelling (labelled) core
    env_arr: jnp.ndarray      # [n_bonds, B, pad]: row t = carry-in wing at bond t
                              # — directly the next half-sweep's `opp_env`
    env_sig: jnp.ndarray      # [n_bonds, B]
    stats: jnp.ndarray        # [n_bonds, stats_len], row t = bond t


def _edge(nb, pad, dtype):
    return (jnp.zeros((nb, pad), dtype or jnp.float32).at[:, 0].set(1.0),
            jnp.zeros((nb,), jnp.float32))


@partial(jax.jit, static_argnames=("env_dtype",))
def init_right_wings(cores, xs, env_dtype=None):
    """Initial bond-aligned right-wing stack (TrainStates::init, fixedL.cc:122-157).

    ``cores`` [n-1, pad, d, pad] and ``xs`` [n-1, d, B] are sites 1..N-1 in site
    order.  Scanning them in reverse and emitting carry-ins yields rows
    row t = right wing covering sites t+2..N-1 (row N-2 = the edge) — exactly the
    `opp_env` layout the first forward half-sweep reads.
    """
    nb = xs.shape[2]
    pad = cores.shape[1]
    dt = env_dtype or jnp.float32
    # the CARRY stays f32 and only the STORED rows quantize: re-quantizing the
    # carry at every site compounds bf16 rounding into a random walk over up to
    # N sites (~2^-9 * sqrt(N) ≈ 5% wing error at N=784) that corrupts every
    # bond's objective; one rounding per stored row keeps it at ~0.2%
    carry = _edge(nb, pad, None)

    def body(c, inp):
        core, x = inp
        out = env_extend(c[0], c[1], x, core, fromleft=False)
        return out, (c[0].astype(dt), c[1])   # emit carry-IN, quantized once

    _, (envs, sigs) = lax.scan(body, carry, (cores, xs), reverse=True)
    return envs, sigs


@partial(jax.jit, static_argnames=("forward", "method", "npass", "check_r0",
                                   "report", "env_dtype", "mxu_dtype",
                                   "svd_method", "damp", "monotone",
                                   "shift_report", "nl"),
         donate_argnums=(1, 2, 3))
def half_sweep(carry_core,        # [pad,d,pad,J] active core (label rides here)
               next_cores,        # [n_bonds, pad,d,pad] row t: core absorbed at bond t
               opp_env, opp_sig,  # [n_bonds, B, pad],[n_bonds, B] row t: far wing at bond t
               x_left, x_right,   # [n_bonds, d, B] rows t: features of sites t, t+1
               Y, labels, hyp_f, hyp_i,
               forward: bool, method: str, npass: int, check_r0: bool,
               report: bool, env_dtype=None, mxu_dtype=None,
               svd_method: str = "gram", damp: bool = False,
               monotone: bool = False, shift_report: bool = False,
               nl: int = 10):
    """One fused half-sweep over bonds 0..n_bonds-1 (forward) or reversed.

    The bond-aligned stacks live in the fori_loop CARRY and are updated in place:
    iteration for bond t reads row t (the far wing / the core to absorb) and then
    overwrites that same row with its own output (the carry-in wing / the finalized
    core).  With the input buffers donated, the whole sweep holds exactly ONE wing
    stack in HBM — at 60k images an 11 GB buffer, never two.
    """
    lam, cconv = hyp_f[0], hyp_f[1]
    cutoff = hyp_f[2]
    maxm, minm = hyp_i[0], hyp_i[1]
    nb = Y.shape[0]
    pad = carry_core.shape[0]
    n_bonds = next_cores.shape[0]
    npass_len = step_ops.stats_len(npass, nl)
    # f32 carry; stored stack rows quantize once at emission (see
    # init_right_wings — per-site re-quantization compounds over the chain)
    carry0 = _edge(nb, pad, None)

    def body(i, st):
        env_st, sig_st, core_st, stats_st, near_arr, near_sig, core_t = st
        t = i if forward else (n_bonds - 1 - i)
        opp_a = lax.dynamic_index_in_dim(env_st, t, keepdims=False)
        opp_s = lax.dynamic_index_in_dim(sig_st, t, keepdims=False)
        w_next = lax.dynamic_index_in_dim(core_st, t, keepdims=False)
        xl = lax.dynamic_index_in_dim(x_left, t, keepdims=False)
        xr = lax.dynamic_index_in_dim(x_right, t, keepdims=False)
        if forward:
            wl, wr = core_t, w_next
            LE, lsc, RE, rsc = near_arr, near_sig, opp_a, opp_s
            label_leg, x_shift = "right", xl
        else:
            wl, wr = w_next, core_t
            LE, lsc, RE, rsc = opp_a, opp_s, near_arr, near_sig
            label_leg, x_shift = "left", xr

        B5 = bond_ops.make_bond(wl, wr)
        cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xl, xr, Y, lam, cconv,
                              npass=npass, fast=method.startswith("fast"),
                              check_r0=check_r0, mxu_dtype=mxu_dtype,
                              fast_exact=(method == "fast_conj_exact"),
                              labels=labels,
                              metrics=((shift_report or monotone) and report),
                              nl=nl,
                              # measured default: the scan-fused body keeps the
                              # while_loop CG (.bench/r5_unroll.log: unroll is
                              # 33% slower inside this scan)
                              unroll=bond_ops.resolve_unroll(False))
        if damp:
            # bond-update damping (engine.alpha -> hyp_f[5]); statically gated
            # so the default alpha=1 sweep emits no extra ops
            alpha = hyp_f[5]
            cg = cg._replace(B5=alpha * cg.B5 + (1.0 - alpha) * B5)
        nwl, nwr, rank, truncerr = bond_ops.split_bond(
            cg.B5, cutoff, maxm, minm, label_leg=label_leg,
            iso_left=forward, method=svd_method)

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
            # gated acceptance: quadcost passes fire only at candidates with
            # real truncation (bond.monotone_accept_gated); metrics slots
            # carry INCOMING values for the engine's shift.  Requires the
            # exact CG cost identity (engine._shift_ok enforces).
            if not est_pre:
                raise ValueError("gated monotone needs conj/fast_conj_exact "
                                 "without damping")
            (nwl, nwr, rank, truncerr, rejected, _cost_sel,
             aux) = bond_ops.monotone_accept_gated(
                B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xl, xr, Y,
                labels, lam, cutoff, maxm, minm, label_leg, forward,
                svd_method, cost0=cg.cost0, est_cost=cg.est_cost,
                mxu_dtype=mxu_dtype, nl=nl)
            cost, per_label, ncor, reg = cg.cost0, cg.pl0, cg.ncor0, cg.reg0
            cost_pre = cg.est_cost
        elif monotone:
            (nwl, nwr, rank, truncerr, cost, per_label, ncor,
             reg, rejected, aux) = bond_ops.monotone_accept(
                B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xl, xr, Y,
                labels, lam, cutoff, maxm, minm, label_leg, forward,
                svd_method, mxu_dtype=mxu_dtype, nl=nl)
            cost_pre = pre_split_cost() if report else jnp.float32(jnp.nan)
        elif report and shift_report:
            # shifted reporting (step.py): cost slots carry the INCOMING
            # metrics, free off the CG gradient pass; the engine shifts the
            # group back one visit (gauge invariance) — no post-split pass
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
            fixed_core, core_next = nwl, nwr      # label moved right into nwr
            new = env_extend(near_arr, near_sig, x_shift, nwl,
                             fromleft=True)
        else:
            fixed_core, core_next = nwr, nwl      # label moved left into nwl
            new = env_extend(near_arr, near_sig, x_shift, nwr,
                             fromleft=False)

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
        # overwrite the consumed row in place: the CARRY-IN wing is exactly the
        # row the opposite direction reads at this bond
        env_st = lax.dynamic_update_index_in_dim(
            env_st, near_arr.astype(env_st.dtype), t, 0)
        sig_st = lax.dynamic_update_index_in_dim(sig_st, near_sig, t, 0)
        core_st = lax.dynamic_update_index_in_dim(core_st, fixed_core, t, 0)
        stats_st = lax.dynamic_update_index_in_dim(stats_st, stats, t, 0)
        return (env_st, sig_st, core_st, stats_st, new[0], new[1], core_next)

    stats0 = jnp.zeros((n_bonds, npass_len), jnp.float32)
    init = (opp_env, opp_sig, next_cores, stats0, carry0[0], carry0[1], carry_core)
    (env_st, sig_st, core_st, stats_st, _, _, fin_core) = lax.fori_loop(
        0, n_bonds, body, init)
    return HalfSweepResult(core_st, fin_core, env_st, sig_st, stats_st)
