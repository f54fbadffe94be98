"""Fully-fused per-bond training step: ONE jitted call per bond.

Dispatch discipline is the perf story: the reference pays disk round-trips per bond
(fixedL.cc:153,177-178); a naive port pays host<->device round-trips instead (scalar
transfers, eager slicing, per-bond metric syncs — each a full tunnel RTT on networked
TPU).  Here the whole bond step — bond assembly, CG passes, truncated-SVD split,
post-SVD cost report, and the environment shift — trace into a single XLA program, so
the Python sweep loop only enqueues one async call per bond and never blocks.  All
per-bond metrics are packed into one flat f32 vector and fetched in bulk at sweep end.

Hyperparameters arrive as two tiny device-resident arrays (hyp_f = [lambda, cconv,
cutoff, pcut, noise, alpha], hyp_i = [maxm, minm]) created once per sweep, so LAMBDA hot-reload
(fixedL.cc:550-559) and per-sweep schedules never retrace.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tnml_tpu.train import bond as bond_ops

# stats vector layout: 10 scalar slots, then nl per-label cost entries, then
# npass CG cost entries, then npass CG |r| entries
(S_RANK, S_TRUNCERR, S_COST, S_NCOR, S_REG, S_R0, S_PASSES, S_AUX,
 S_REPLACED, S_COST_PRE) = range(10)
S_PER_LABEL = 10          # nl entries


def s_cg(nl: int) -> int:
    return S_PER_LABEL + nl


def stats_len(npass: int, nl: int) -> int:
    return s_cg(nl) + 2 * npass


@partial(jax.jit, static_argnames=("label_leg", "iso_left", "method", "npass",
                                   "check_r0", "report", "use_noise", "ntarget",
                                   "env_dtype", "mxu_dtype", "svd_method",
                                   "replace", "damp", "monotone",
                                   "shift_report", "nl"))
def fused_bond_step(wl, wr, LE, lsc, RE, rsc, xc, x1, Y, labels,
                    hyp_f, hyp_i, key,
                    label_leg: str, iso_left: bool, method: str, npass: int,
                    check_r0: bool, report: bool, use_noise: bool = False,
                    ntarget: int = 10, env_dtype=None, mxu_dtype=None,
                    svd_method: str = "gram", replace: bool = False,
                    damp: bool = False, monotone: bool = False,
                    shift_report: bool = False, nl: int = 10):
    """Returns (wl', wr', env_arr, env_sig, stats_vec).

    ``method``: conj | fast_conj | exact | pinv (single.h:593-605; fixedL only
    supports conj, fixedL.cc:504-505).  ``use_noise`` switches the split to the
    DMRG density-matrix update (single.h:625-672).  ``env_arr/env_sig`` is the
    shifted wing: built from LE over the left active site when sweeping right
    (iso_left=True), from RE over the right active site otherwise — exactly
    TrainStates::shiftE (fixedL.cc:192-233).  ``key``: uint32[2] seed material for
    pinv's random sketch start (ignored otherwise).
    """
    from tnml_tpu.train import solvers

    lam, cconv, cutoff, pcut, noise = (hyp_f[0], hyp_f[1], hyp_f[2], hyp_f[3],
                                       hyp_f[4])
    maxm, minm = hyp_i[0], hyp_i[1]   # hyp_i[2] mirrors the static `ntarget`

    B5 = bond_ops.make_bond(wl, wr)
    aux = jnp.float32(0.0)
    if shift_report and (replace or use_noise
                         or method not in ("conj", "fast_conj",
                                           "fast_conj_exact")):
        raise ValueError("shift_report needs a plain CG method (the incoming "
                         "metrics come off the CG gradient pass)")
    if shift_report and monotone and (damp or method not in
                                      ("conj", "fast_conj_exact")):
        raise ValueError("shift_report with monotone acceptance needs the "
                         "exact CG cost identity (conj/fast_conj_exact, no "
                         "damping) — bond.monotone_accept_gated")
    if method in ("conj", "fast_conj", "fast_conj_exact"):
        cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xc, x1, Y, lam, cconv,
                              npass=npass, fast=method.startswith("fast"),
                              check_r0=check_r0, mxu_dtype=mxu_dtype,
                              fast_exact=(method == "fast_conj_exact"),
                              labels=labels,
                              metrics=((shift_report or monotone) and report),
                              nl=nl, unroll=bond_ops.resolve_unroll(True))
    elif method == "exact":
        Bex = solvers.exact_solve(B5, LE, lsc, RE, rsc, xc, x1, Y[:, 0], lam, pcut)
        cg = bond_ops.CGResult(Bex, jnp.int32(0), jnp.float32(0.0),
                               jnp.zeros((npass,), jnp.float32),
                               jnp.zeros((npass,), jnp.float32),
                               jnp.float32(jnp.nan), jnp.float32(jnp.nan),
                               jnp.zeros((nl,), jnp.float32), jnp.int32(-1),
                               jnp.float32(0.0))
    elif method == "pinv":
        # reference quirk preserved: pinv's solution is only REPORTED (its cost
        # lands in the AUX stats slot); the kept update comes from a conj
        # refinement of the original B (single.h:596-604)
        k = jax.random.PRNGKey(key[0])
        V0 = jax.random.normal(k, (B5.size, ntarget), jnp.float32)
        Bp, _VE = solvers.pinv_solve(B5, LE, lsc, RE, rsc, xc, x1, Y[:, 0],
                                     lam, pcut, V0, npass=npass)
        aux, _, _, _ = bond_ops.quadcost(Bp, LE, lsc, RE, rsc, xc, x1, Y,
                                         labels, lam, nl=nl)
        cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xc, x1, Y, lam, cconv,
                              npass=npass, fast=False, check_r0=check_r0, nl=nl,
                              unroll=bond_ops.resolve_unroll(True))
    else:
        raise ValueError(f"method {method!r} not recognized")

    if damp:
        # bond-update damping (the reference's reserved `alpha` input,
        # README.md:76, realized as the standard DMRG mixing parameter): blend
        # the solver output with the incoming bond.  Statically gated so the
        # default alpha=1 path emits no extra ops and keeps B5 dead after the
        # solve (it would otherwise stay live across the split).
        alpha = hyp_f[5]
        cg = cg._replace(B5=alpha * cg.B5 + (1.0 - alpha) * B5)

    if use_noise:
        env, env_s = (LE, lsc) if iso_left else (RE, rsc)
        nwl, nwr, rank, truncerr = solvers.noise_split(
            cg.B5, env, env_s, cutoff, maxm, minm, noise, iso_left=iso_left)
    else:
        nwl, nwr, rank, truncerr = bond_ops.split_bond(
            cg.B5, cutoff, maxm, minm, label_leg=label_leg, iso_left=iso_left,
            method=svd_method)

    # the pre-split cost of the optimizer output is FREE for the CG methods with
    # exact recurrences (cg.est_cost via the line-search identity) — a full data
    # pass per bond otherwise; damping invalidates the identity (blended B)
    est_pre = method in ("conj", "fast_conj_exact") and not damp

    def pre_split_cost():
        if est_pre:
            return cg.est_cost
        return bond_ops.quadcost(cg.B5, LE, lsc, RE, rsc, xc, x1, Y, labels,
                                 lam, mxu_dtype=mxu_dtype, nl=nl)[0]

    replaced = jnp.bool_(False)
    if monotone and shift_report:
        # gated acceptance (bond.monotone_accept_gated): the dual quadcost
        # passes fire only at bonds with real truncation on that candidate;
        # metrics slots carry the INCOMING values for the engine's shift
        if use_noise or replace:
            raise ValueError("monotone acceptance excludes noise and replace")
        (nwl, nwr, rank, truncerr, replaced, _cost_sel,
         aux) = bond_ops.monotone_accept_gated(
            B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xc, x1, Y,
            labels, lam, cutoff, maxm, minm, label_leg, iso_left, svd_method,
            cost0=cg.cost0, est_cost=cg.est_cost, mxu_dtype=mxu_dtype, nl=nl)
        cost, per_label, ncor, reg = cg.cost0, cg.pl0, cg.ncor0, cg.reg0
        cost_pre = cg.est_cost
    elif monotone:
        if use_noise or replace:
            raise ValueError("monotone acceptance excludes noise and replace")
        (nwl, nwr, rank, truncerr, cost, per_label, ncor,
         reg, replaced, aux) = bond_ops.monotone_accept(
            B5, nwl, nwr, rank, truncerr, LE, lsc, RE, rsc, xc, x1, Y,
            labels, lam, cutoff, maxm, minm, label_leg, iso_left, svd_method,
            mxu_dtype=mxu_dtype, nl=nl)
        cost_pre = pre_split_cost() if report else jnp.float32(jnp.nan)
    elif report and shift_report:
        # shifted reporting: the cost stats slots carry the INCOMING bond's
        # metrics (free off the CG gradient pass).  By gauge invariance these
        # equal the PREVIOUS visit's post-split metrics, so the engine shifts
        # the whole group back one visit when building the history — the
        # reference's per-bond post-SVD report (fixedL.cc:532) with no
        # dedicated post-split data pass (~2 ms/bond at the full set).
        cost, per_label, ncor, reg = cg.cost0, cg.pl0, cg.ncor0, cg.reg0
        cost_pre = pre_split_cost()
    elif replace or report:
        newB = bond_ops.make_bond(nwl, nwr)
        cost, per_label, ncor, reg = bond_ops.quadcost(
            newB, LE, lsc, RE, rsc, xc, x1, Y, labels, lam, mxu_dtype=mxu_dtype,
            nl=nl)
        # pre-split cost of the optimizer output, for the reference's ">10%
        # larger C after SVD" truncation-regression check (fixedL.cc:523-533)
        cost_pre = pre_split_cost()
    else:
        cost = jnp.float32(jnp.nan)
        cost_pre = jnp.float32(jnp.nan)
        per_label = jnp.zeros((nl,), jnp.float32)
        ncor, reg = jnp.int32(-1), jnp.float32(0.0)

    if replace:
        # the reference's experimental 'replace' feature, realized (README.md:76;
        # dead code at fixedL.cc:512-514): revert the bond when the post-SVD cost
        # exceeds the pre-optimization cost.  Only meaningful when the label does
        # not move between the cores (fixed-label / single), where old and new
        # cores have identical shapes.
        if wl.shape != nwl.shape or wr.shape != nwr.shape:
            raise ValueError("replace=yes requires the fixed-label layout")
        oldC, _, _, _ = bond_ops.quadcost(B5, LE, lsc, RE, rsc, xc, x1, Y,
                                          labels, lam, mxu_dtype=mxu_dtype,
                                          nl=nl)
        replaced = cost > oldC
        nwl = jnp.where(replaced, wl, nwl)
        nwr = jnp.where(replaced, wr, nwr)
        cost = jnp.where(replaced, oldC, cost)

    # environment shift over the freshly isometric core
    from tnml_tpu.train.env import env_extend
    if iso_left:
        env_arr, env_sig = env_extend(LE, lsc, xc, nwl, fromleft=True,
                                      out_dtype=env_dtype)
    else:
        env_arr, env_sig = env_extend(RE, rsc, x1, nwr, fromleft=False,
                                      out_dtype=env_dtype)

    stats = jnp.zeros((stats_len(npass, nl),), jnp.float32)
    stats = stats.at[S_AUX].set(aux)
    stats = stats.at[S_REPLACED].set(replaced.astype(jnp.float32))
    stats = stats.at[S_RANK].set(rank.astype(jnp.float32))
    stats = stats.at[S_TRUNCERR].set(truncerr)
    stats = stats.at[S_COST].set(cost)
    stats = stats.at[S_NCOR].set(ncor.astype(jnp.float32))
    stats = stats.at[S_REG].set(reg)
    stats = stats.at[S_R0].set(cg.r0norm)
    stats = stats.at[S_PASSES].set(cg.passes.astype(jnp.float32))
    stats = stats.at[S_COST_PRE].set(cost_pre)
    stats = lax.dynamic_update_slice(stats, per_label.astype(jnp.float32),
                                     (S_PER_LABEL,))
    stats = lax.dynamic_update_slice(stats, cg.costs, (s_cg(nl),))
    stats = lax.dynamic_update_slice(stats, cg.rnorms, (s_cg(nl) + npass,))
    return nwl, nwr, env_arr, env_sig, stats


@partial(jax.jit, static_argnames=("n",))
def split_sites(Xs, n: int) -> Tuple[jnp.ndarray, ...]:
    """[N, B, d] -> tuple of N per-site [B, d] arrays, in one device call."""
    return tuple(Xs[j] for j in range(n))
