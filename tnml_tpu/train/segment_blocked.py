"""Checkpointed-rebuild ("blocked") fused half-sweeps for the FIXED-label layout
at batch sizes whose full labelled wing buffer exceeds HBM.

``segment_fixed`` keeps the full bond-aligned wing stacks resident; the labelled
buffer is R x [B, nl, m] — ~55 GB at the full 58,862-image set (m=120, bf16,
R=391), far beyond one 16 GB chip.  This module trades ~1 extra ``env_extend``
per bond for sqrt-style memory: only one wing per K-bond BLOCK is stored (the
block's boundary); the K far wings a block consumes are rebuilt on the fly from
that boundary and the current cores.  The rebuild is exact because every
rebuilt row only crosses cores the running half-sweep has not yet touched —
the same invariant that makes the ping-pong emission correct (TrainStates::
shiftE, fixedL.cc:192-233; the reference's own disk-batched environments rely
on it at fixedL.cc:115-157, which this is the HBM-resident sqrt-memory analog
of).

The boundary checkpoints are exactly the near-wing carries ENTERING each block
of the opposite direction, so the engine records them host-side as block
inputs — there are no emission buffers at all.  Residency: (R/K + K) wing rows
instead of R; at K ~ sqrt(R) ~ 20 the labelled wings drop from ~55 GB to ~6 GB
at the full set, which fits one chip alongside the model and features.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Rebuild-carry dtype (read once at import, traced-in statically): 'bf16'
# keeps the rebuild chain's wing carry in bfloat16 between extends — halves
# the dominant HBM traffic of the blocked engine (.bench/PROFILE_r3.md) at
# the cost of one extra rounding per crossed site (chains are <= K sites from
# an already-quantized boundary).  Since round 5 the default is AUTO: carry
# follows the wing STORAGE dtype (bf16 carry iff wings are stored bf16,
# rebuild_fast) — quality-gated at the full-set flagship, 100.00% held-out
# from sweep 4 exactly like the f32-carry control
# (.bench/r5_flagship_carry.log vs r5_flagship_gated.log).  'f32' opts out.
_REBUILD_CARRY = os.environ.get("TNML_REBUILD_CARRY", "auto")

# TNML_REBUILD_NONORM skips the per-extend max/div normalization inside
# rebuild chains (crossed cores are canonical => near-isometric, so scale
# drift over <= K sites is bounded; scale rides in the values, sigma math
# unchanged).  Saves the [B, nl, m] max+div passes per extend.  AUTO since
# round 5: on iff wings are stored bf16 (same quality gate as the carry,
# the two were validated as a pair).  '0' opts out, '1' forces on.
_REBUILD_NONORM = os.environ.get("TNML_REBUILD_NONORM", "auto")


def _carry_bf16(fast: bool) -> bool:
    return _REBUILD_CARRY == "bf16" or (fast and _REBUILD_CARRY == "auto")


def _nonorm(fast: bool) -> bool:
    return _REBUILD_NONORM == "1" or (fast and _REBUILD_NONORM == "auto")

from tnml_tpu.train import step as step_ops
from tnml_tpu.train.env import env_extend
from tnml_tpu.train.segment_fixed import plain_bond_body


def rebuild_fast(env_dtype) -> bool:
    """Whether rebuild chains may run at DEFAULT matmul precision (single-pass
    bf16 operands).  Only when the wings are STORED in bfloat16 — then the
    6-pass 'highest' rebuild work is discarded by the storage rounding anyway
    (67% of the fixed full-set sweep, .bench/PROFILE_r3.md).  With f32 wing
    storage (env_dtype=None) the rebuilds keep the engine's configured
    precision: the blocked engine is auto-selected purely on buffer size, and
    an f32 run must match the resident engine bit-for-bit in spirit (advisor
    r3, medium)."""
    return env_dtype is not None and jnp.dtype(env_dtype) == jnp.dtype(jnp.bfloat16)


def partition_bonds(lo: int, hi: int, K: int):
    """Bonds lo..hi-1 split into [(t0, T)] blocks of at most K."""
    out = []
    t = lo
    while t < hi:
        out.append((t, min(K, hi - t)))
        t += min(K, hi - t)
    return out


@partial(jax.jit, static_argnames=("T", "fromleft"))
def extend_run(arr, sig, cores_st, xs, start, T: int, fromleft: bool):
    """Extend a wing over T consecutive PLAIN sites, walking down from ``start``
    (right wings, fromleft=False: sites start, start-1, ...) or up (left wings).
    ``start`` is dynamic so one compilation serves every block position.  The
    carry stays f32 (quantize-once discipline, see segment.init_right_wings)."""

    def body(k, st):
        a, s = st
        site = (start - k) if not fromleft else (start + k)
        core = lax.dynamic_index_in_dim(cores_st, site, keepdims=False)
        x = lax.dynamic_index_in_dim(xs, site, keepdims=False)
        return env_extend(a, s, x, core, fromleft=fromleft)

    return lax.fori_loop(0, T, body, (arr.astype(jnp.float32), sig))


@partial(jax.jit,
         static_argnames=("T", "forward", "method", "npass", "report",
                          "env_dtype", "mxu_dtype", "svd_method", "damp",
                          "monotone", "shift_report", "nl"),
         donate_argnums=(0, 4))
def blocked_segment(cores_st,             # [N, pad, d, pad] donated
                    cur_core,             # [pad, d, pad] travelling core
                    near_arr, near_sig,   # [B, (nl,) m], [B] f32 carry
                    b_arr, b_sig,         # boundary far wing (donated)
                    xs, Y, labels, hyp_f, hyp_i, t0,
                    T: int, forward: bool, method: str, npass: int,
                    report: bool, env_dtype=None, mxu_dtype=None,
                    svd_method: str = "gram", damp: bool = False,
                    monotone: bool = False, shift_report: bool = False,
                    nl: int = 10):
    """Bonds t0..t0+T-1 (forward) or reversed, all label-free active pairs,
    with the K far wings rebuilt in-jit from the block's boundary wing.

    Forward: far rows are RIGHT wings; the boundary is the wing at bond
    t0+T-1 (covering sites t0+T+1..); rows below rebuild downward over sites
    t0+T .. t0+2.  Backward: far rows are LEFT wings; the boundary is the wing
    at bond t0 (covering 0..t0-1); rows above rebuild upward over sites
    t0 .. t0+T-2.  Every crossed core is untouched by the running half-sweep
    at both rebuild and consumption time (module docstring).

    Returns (cores_st', cur', near_arr', near_sig', stats [T, stats_len]) with
    stats rows in bond order t0..t0+T-1.
    """
    dt = env_dtype or jnp.float32
    fast = rebuild_fast(env_dtype)
    carry_bf16 = _carry_bf16(fast)
    nonorm = _nonorm(fast)
    nb = b_arr.shape[0]
    pad = cores_st.shape[1]
    lab_shape = (nb, b_arr.shape[1], pad) if b_arr.ndim == 3 else (nb, pad)
    far_buf = jnp.zeros((T,) + lab_shape, dt)
    far_sig = jnp.zeros((T, nb), jnp.float32)

    if forward:
        far_buf = far_buf.at[T - 1].set(b_arr.astype(dt))
        far_sig = far_sig.at[T - 1].set(b_sig)

        def build(k, st):
            buf, sg, a, s = st
            site = t0 + T + 1 - k       # row T-1-k covers sites t0+T+1-k ..
            core = lax.dynamic_index_in_dim(cores_st, site, keepdims=False)
            x = lax.dynamic_index_in_dim(xs, site, keepdims=False)
            # fast (bf16-stored wings only, see rebuild_fast): rebuilt rows
            # quantize to env_dtype on storage anyway, and rebuild chains are
            # <= K sites from a quantized boundary
            a, s = env_extend(a, s, x, core, fromleft=False, fast=fast,
                              out_dtype=(dt if carry_bf16 else None),
                              normalize=not nonorm)
            buf = lax.dynamic_update_index_in_dim(buf, a.astype(dt), T - 1 - k, 0)
            sg = lax.dynamic_update_index_in_dim(sg, s, T - 1 - k, 0)
            return buf, sg, a, s
    else:
        far_buf = far_buf.at[0].set(b_arr.astype(dt))
        far_sig = far_sig.at[0].set(b_sig)

        def build(k, st):
            buf, sg, a, s = st
            site = t0 + k - 1           # row k covers sites 0 .. t0+k-1
            core = lax.dynamic_index_in_dim(cores_st, site, keepdims=False)
            x = lax.dynamic_index_in_dim(xs, site, keepdims=False)
            a, s = env_extend(a, s, x, core, fromleft=True, fast=fast,
                              out_dtype=(dt if carry_bf16 else None),
                              normalize=not nonorm)
            buf = lax.dynamic_update_index_in_dim(buf, a.astype(dt), k, 0)
            sg = lax.dynamic_update_index_in_dim(sg, s, k, 0)
            return buf, sg, a, s

    carry_dt = dt if carry_bf16 else jnp.float32
    far_buf, far_sig, _, _ = lax.fori_loop(
        1, T, build, (far_buf, far_sig, b_arr.astype(carry_dt), b_sig))

    npass_len = step_ops.stats_len(npass, nl)

    def body(i, st):
        cores_st, cur, n_arr, n_sig, stats_st = st
        t = (t0 + i) if forward else (t0 + T - 1 - i)
        idx = t - t0
        far_a = lax.dynamic_index_in_dim(far_buf, idx, keepdims=False)
        far_s = lax.dynamic_index_in_dim(far_sig, idx, keepdims=False)
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
        cores_st = lax.dynamic_update_index_in_dim(cores_st, fixed_core,
                                                   site_fix, 0)
        stats_st = lax.dynamic_update_index_in_dim(stats_st, stats, i, 0)
        return (cores_st, nxt, new[0], new[1], stats_st)

    stats0 = jnp.zeros((T, npass_len), jnp.float32)
    out = lax.fori_loop(0, T, body,
                        (cores_st, cur_core, near_arr, near_sig, stats0))
    cores_st, cur, n_arr, n_sig, stats_st = out
    if not forward:
        stats_st = stats_st[::-1]       # rows in bond order t0..t0+T-1
    return cores_st, cur, n_arr, n_sig, stats_st


@partial(jax.jit,
         static_argnames=("label_leg", "forward", "method", "npass", "report",
                          "env_dtype", "mxu_dtype", "svd_method", "damp",
                          "monotone", "shift_report", "nl"))
def center_step_far(wl, wr, near_arr, near_sig, far_a, far_s,
                    xl, xr, Y, labels, hyp_f, hyp_i,
                    label_leg: str, forward: bool, method: str, npass: int,
                    report: bool, env_dtype=None, mxu_dtype=None,
                    svd_method: str = "gram", damp: bool = False,
                    monotone: bool = False, shift_report: bool = False,
                    nl: int = 10):
    """A label-core bond (c-1 or c) with the far wing passed explicitly (the
    blocked engine keeps the two center wings as dedicated checkpoints instead
    of rows of a plain buffer — see segment_fixed.center_step)."""
    if forward:
        LE, lsc, RE, rsc = near_arr, near_sig, far_a, far_s
    else:
        LE, lsc, RE, rsc = far_a, far_s, near_arr, near_sig
    key = jnp.zeros((1,), jnp.uint32)
    return step_ops.fused_bond_step(
        wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, key,
        label_leg=label_leg, iso_left=forward, method=method, npass=npass,
        check_r0=False, report=report, use_noise=False,
        env_dtype=None, mxu_dtype=mxu_dtype, svd_method=svd_method,
        replace=False, damp=damp, monotone=monotone,
        shift_report=shift_report, nl=nl)
