"""Scan-fused half-sweeps: one jitted ``lax.scan`` call per half-sweep.

The per-bond engine enqueues one device call per bond; through a networked TPU each
call carries ~1-1.5 ms of fixed overhead — comparable to the bond's compute.  For
model families whose bond structure is uniform along the chain (the moving-label
fixedL mode and the label-free `single` family: the label rides ON the active pair,
every wing is [B,1,m]), the whole half-sweep folds into a single ``lax.scan``:

  carry: (left wing (arr, sig), the active core that travels with the sweep)
  xs:    per-bond rows — the opposite wing (consumed in order), the two feature
         slices, the not-yet-touched next core
  ys:    finalized cores, the freshly written wings (consumed by the NEXT half-sweep
         in reverse order), and the per-bond stats vector

No per-site dict, no per-bond dispatch: the engine ping-pongs four stacked arrays
between two scan calls per sweep.  The fixed-label mode keeps the per-bond path (its
wings change width at the label core); fusing it is a planned follow-up.
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
    cores: jnp.ndarray        # [n_bonds, pad, d, pad] finalized plain cores
    carry_core: jnp.ndarray   # [pad, d, pad, J] the travelling (labelled) core
    env_arr: jnp.ndarray      # [n_bonds, B, 1, pad] wings written this half-sweep
    env_sig: jnp.ndarray      # [n_bonds, B]
    stats: jnp.ndarray        # [n_bonds, stats_len]


@partial(jax.jit, static_argnames=("forward", "method", "npass", "check_r0",
                                   "report", "env_dtype", "mxu_dtype",
                                   "svd_method"))
def half_sweep(carry_core,        # [pad,d,pad,J] active core (label rides here)
               next_cores,        # [n, pad,d,pad] cores the sweep will absorb
               opp_env, opp_sig,  # [n, B, 1, pad], [n, B]: wings on the far side
               x_active, x_next,  # [n, B, d]: features of active/next site per bond
               Y, labels, hyp_f, hyp_i,
               forward: bool, method: str, npass: int, check_r0: bool,
               report: bool, env_dtype=None, mxu_dtype=None,
               svd_method: str = "gram"):
    """One fused half-sweep for travelling-label structure.

    ``forward=True``: active core is the LEFT member of each pair, the opposite wing
    is the RIGHT env stack, and the freshly written wings are LEFT envs (and vice
    versa).  Rows of all xs stacks are ordered in bond-visit order.
    """
    lam, cconv = hyp_f[0], hyp_f[1]
    cutoff = hyp_f[2]
    maxm, minm = hyp_i[0], hyp_i[1]
    nb = Y.shape[0]
    pad = carry_core.shape[0]

    edge_arr = jnp.zeros((nb, 1, pad),
                         env_dtype or jnp.float32).at[:, 0, 0].set(1.0)
    edge_sig = jnp.zeros((nb,), jnp.float32)

    def body(carry, xs):
        (near_arr, near_sig, core_t) = carry
        (opp_a, opp_s, xa, xn, w_next) = xs
        if forward:
            wl, wr = core_t, w_next
            LE, lsc, RE, rsc = near_arr, near_sig, opp_a, opp_s
            xc, x1 = xa, xn
            label_leg = "right"
        else:
            wl, wr = w_next, core_t
            LE, lsc, RE, rsc = opp_a, opp_s, near_arr, near_sig
            xc, x1 = xn, xa
            label_leg = "left"

        B5 = bond_ops.make_bond(wl, wr)
        cg = bond_ops.cg_bond(B5, LE, lsc, RE, rsc, xc, x1, Y, lam, cconv,
                              npass=npass, fast=method.startswith("fast"),
                              check_r0=check_r0, mxu_dtype=mxu_dtype,
                              fast_exact=(method == "fast_conj_exact"))
        nwl, nwr, rank, truncerr = bond_ops.split_bond(
            cg.B5, cutoff, maxm, minm, label_leg=label_leg,
            iso_left=forward, method=svd_method)

        if report:
            newB = bond_ops.make_bond(nwl, nwr)
            cost, per_label, ncor, reg = bond_ops.quadcost(
                newB, LE, lsc, RE, rsc, xc, x1, Y, labels, lam,
                mxu_dtype=mxu_dtype)
        else:
            cost = jnp.float32(jnp.nan)
            per_label = jnp.zeros((10,), jnp.float32)
            ncor, reg = jnp.int32(-1), jnp.float32(0.0)

        if forward:
            fixed_core, core_next = nwl, nwr      # label moved right into nwr
            new_arr, new_sig = env_extend(near_arr, near_sig, xa, nwl,
                                          fromleft=True, out_dtype=env_dtype)
        else:
            fixed_core, core_next = nwr, nwl      # label moved left into nwl
            new_arr, new_sig = env_extend(near_arr, near_sig, xa, nwr,
                                          fromleft=False, out_dtype=env_dtype)

        stats = jnp.zeros((step_ops.stats_len(npass),), jnp.float32)
        stats = stats.at[step_ops.S_RANK].set(rank.astype(jnp.float32))
        stats = stats.at[step_ops.S_TRUNCERR].set(truncerr)
        stats = stats.at[step_ops.S_COST].set(cost)
        stats = stats.at[step_ops.S_NCOR].set(ncor.astype(jnp.float32))
        stats = stats.at[step_ops.S_REG].set(reg)
        stats = stats.at[step_ops.S_R0].set(cg.r0norm)
        stats = stats.at[step_ops.S_PASSES].set(cg.passes.astype(jnp.float32))
        stats = lax.dynamic_update_slice(stats, per_label, (step_ops.S_PER_LABEL,))
        stats = lax.dynamic_update_slice(stats, cg.costs, (step_ops.S_CG,))
        stats = lax.dynamic_update_slice(stats, cg.rnorms,
                                         (step_ops.S_CG + npass,))
        return ((new_arr, new_sig, core_next),
                (fixed_core, new_arr, new_sig, stats))

    init = ((edge_arr, edge_sig, carry_core))
    (fin_arr, fin_sig, fin_core), (cores, env_arr, env_sig, stats) = lax.scan(
        body, init, (opp_env, opp_sig, x_active, x_next, next_cores))
    return HalfSweepResult(cores, fin_core, env_arr, env_sig, stats)
