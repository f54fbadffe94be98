"""Two-site bond tensor: assembly, batched apply/gradient, CG optimizer, SVD split.

This is the hot path — the TPU-native replacement for the reference's per-image
ITensor contractions inside ``cgrad`` (fixedL.cc:349-445) and the ``svd`` bond split
(fixedL.cc:519-525).  Everything is batched over images as dense einsums that XLA maps
onto the MXU; the three CG reductions per pass (gradient tensor, pAp, cost) contract
over the batch axis and become cross-chip psums when the batch is sharded.

Uniform tensor layout (exactly one of K_l/J/K_r is the label dimension L for fixedL;
all are 1 for the one-vs-rest `single` model, whose targets ride in Y):

    B5    [a, s, t, r, J]    two-site bond tensor (a/r: padded bonds, s/t: phys, J label)
    LE    [B, K_l, a]        left wing  (+ per-image log-scale sigma_L [B])
    RE    [B, K_r, r]        right wing (+ sigma_R)
    xc,x1 [d, B]             phi features of the two active sites (lanes = batch)
    Y     [B, K_l*J*K_r]     targets (one-hot rows for fixedL; {0,1} scalars for single)
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Wing-product fusion barrier, DEFAULT ON (opt out with TNML_WING_BARRIER=0).
# Read once at import, traced-in statically.  Measured -0.22 s/sweep at the
# full set (.bench/PROFILE_r3.md); see the use site in cg_bond.
_WING_BARRIER = os.environ.get("TNML_WING_BARRIER", "1") == "1"

# Scoped matmul-precision overrides (round-5 bf16 root-cause work, VERDICT r4
# item 5).  Each pins ONE subsystem's matmuls to a fixed precision while the
# global policy (engine `precision=`) stays whatever the run configured —
# letting a `precision=default` run (single-pass bf16 operands) keep exact
# math only where it is load-bearing.  Values: default | high | highest;
# unset = follow the global policy.  Read once at import, traced-in statically.
#
#   TNML_SPLIT_PRECISION — the truncated-split path (split_bond): the gram
#     product squares the condition number, and in the near-degenerate fixed
#     regime the class signal rides singular values ~1e-3*s_max — exactly the
#     scale of bf16 operand rounding on G (4e-3*s_max^2), so a bf16 gram
#     scrambles the truncation basis at every bond.  Diagnosis + measurements
#     in docs/DESIGN.md ("default-precision collapse").
#   TNML_GRAD0_PRECISION — the first CG gradient/metrics pass in cg_bond
#     (the one-hot residual dP = Y - P cancellation hypothesis).
_SPLIT_PRECISION = os.environ.get("TNML_SPLIT_PRECISION") or None
_GRAD0_PRECISION = os.environ.get("TNML_GRAD0_PRECISION") or None

# Static CG unroll (round-5 perf, VERDICT r4 item 3): npass is a static
# argument, so the CG loop can unroll at trace time instead of running a
# lax.while_loop.  Straight-line code lets the FINAL pass simply omit the
# outer_grad whose result the while_loop body had to compute and discard —
# dropping it there needed a lax.cond, whose branch operands (the wing
# products) then materialize in HBM instead of fusing into the matmuls
# (measured 2x slower, see the body note below).  Early-exit (|r| < cconv)
# semantics are preserved by masking every carry update with `done`, so the
# unrolled trajectory matches the loop: bit-identical for 'conj', last-ulp
# fp-reassociation differences for the fast paths (XLA fuses across unrolled
# iterations); converged bonds burn dead flops instead of exiting, which only
# matters when cconv actually triggers (the flagship burns all passes at
# every bond — STATUS.md round 1).
#
# LAYOUT-GATED, like the wing barrier: measured at the full set
# (.bench/r5_unroll.log), the fixed flagship wins (14.37 -> 13.57 s/sweep,
# -5.6%) but the moving scan-fused path LOSES 33% (8.65 -> 11.46) — inside
# the half-sweep lax.scan body, 4x straight-line CG code breaks XLA's
# barrier-shaped wing-product reuse.  Call sites pass their measured default
# (fixed/per-bond: unroll; moving scan: loop) via `unroll=`;
# TNML_CG_UNROLL=1/0 force-overrides both (auto = caller default).
_CG_UNROLL_ENV = os.environ.get("TNML_CG_UNROLL", "auto")


def resolve_unroll(default: bool) -> bool:
    """Caller-default CG unroll decision, overridable by TNML_CG_UNROLL=1/0."""
    if _CG_UNROLL_ENV in ("auto", ""):
        return default
    return _CG_UNROLL_ENV == "1"


def _prec_scope(mode):
    """Trace-time matmul-precision scope (nullcontext when mode is None)."""
    import contextlib
    if mode is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(mode)

# ---------------------------------------------------------------------------
# bond tensor assembly / disassembly
# ---------------------------------------------------------------------------


def bond_case(b: int, label_site) -> str:
    """Which leg of the active pair (b, b+1) carries the label axis."""
    if label_site is None:
        return "none"
    if label_site < b:
        return "wingL"
    if label_site > b + 1:
        return "wingR"
    return "coreL" if label_site == b else "coreR"


def make_bond(wl: jnp.ndarray, wr: jnp.ndarray) -> jnp.ndarray:
    """B = W_c · W_{c+1} (fixedL.cc:494) -> B5 [a,s,t,r,J]."""
    if wl.ndim == 4 and wr.ndim == 4:
        raise ValueError("both cores carry a label axis")
    if wl.ndim == 4:
        return jnp.einsum("asml,mtr->astrl", wl, wr)
    if wr.ndim == 4:
        return jnp.einsum("asm,mtrl->astrl", wl, wr)
    return jnp.einsum("asm,mtr->astr", wl, wr)[..., None]


# ---------------------------------------------------------------------------
# batched apply / outer-gradient
# ---------------------------------------------------------------------------


def _wing_products(LE, RE, xc, x1, mxu_dtype=None):
    """Lphi [B,K_l,a,s] and Rphi [B,K_r,t,r] — φ folded into the wings.

    With ``mxu_dtype=bfloat16`` the products are stored in bf16 so the big batched
    einsums hit the MXU's bf16 path; every contraction below still accumulates in
    float32 via ``preferred_element_type``.
    """
    from tnml_tpu.train.env import unsqueeze_env
    LE = unsqueeze_env(LE)
    RE = unsqueeze_env(RE)
    xc, x1 = xc.T, x1.T          # [d, B] storage layout -> [B, d] compute form
    Lphi = LE[:, :, :, None] * xc[:, None, None, :]
    Rphi = RE[:, :, None, :] * x1[:, None, :, None]
    if mxu_dtype is not None:
        Lphi = Lphi.astype(mxu_dtype)
        Rphi = Rphi.astype(mxu_dtype)
    return Lphi, Rphi


def apply_bond(B5, Lphi, Rphi):
    """P[b,k,j,m] = <v_b | B>: the model output before target comparison."""
    return jnp.einsum("bkas,astrj,bmtr->bkjm", Lphi, B5.astype(Lphi.dtype), Rphi,
                      preferred_element_type=jnp.float32)


def outer_grad(w, Lphi, Rphi):
    """G[a,s,t,r,j] = sum_b w[b,k,j,m] · v_b — the batched dP·dag(v) accumulation
    (fixedL.cc:375-380)."""
    return jnp.einsum("bkjm,bkas,bmtr->astrj", w.astype(Lphi.dtype), Lphi, Rphi,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# conjugate gradient (fixedL.cc:349-445 semantics, incl. un-NT-normalized gradient)
# ---------------------------------------------------------------------------


class CGResult(NamedTuple):
    B5: jnp.ndarray
    passes: jnp.ndarray      # number of completed B-updates
    r0norm: jnp.ndarray      # |r| of the initial gradient
    costs: jnp.ndarray       # [npass] cost after pass i (0 where not computed)
    rnorms: jnp.ndarray      # [npass] |r| after pass i
    cost0: jnp.ndarray       # quadcost of the INCOMING bond (free: measured in
                             # the first gradient pass)
    est_cost: jnp.ndarray    # quadcost of the OUTGOING bond via the exact CG
                             # line-search identity f(B_{i+1}) = f(B_i) - a_i|r_i|^2
                             # (exact for 'conj'/'fast_conj_exact'; drifts for the
                             # reference's lambda-drifting 'fast_conj' recurrence)
    pl0: jnp.ndarray         # [nl] per-true-label cost of the INCOMING bond
                             # (metrics=True only, else zeros)
    ncor0: jnp.ndarray       # n correct of the INCOMING bond (metrics=True only)
    reg0: jnp.ndarray        # lam*|B_in|^2 (metrics=True only)


@partial(jax.jit, static_argnames=("npass", "fast", "check_r0", "mxu_dtype",
                                   "fast_exact", "metrics", "nl", "unroll"))
def cg_bond(B5, LE, sigL, RE, sigR, xc, x1, Y, lam, cconv,
            npass: int, fast: bool = False, check_r0: bool = False,
            mxu_dtype=None, fast_exact: bool = False,
            labels=None, metrics: bool = False, nl: int = 10,
            unroll: bool = True) -> CGResult:
    """Optimize the bond tensor by CG against A = sum_b v_b v_b^T + lambda.

    ``fast=True`` uses the residual update r <- r - a·Ap (single.h:290-398,
    Shewchuk Eq. 47) instead of recomputing the gradient each pass — one data pass
    per CG iteration instead of two.  The reference's formula carries a lambda
    drift (it subtracts lambda·B_new on top of a residual that already included
    -lambda·B_old, single.h:377-379), which stalls convergence once residuals get
    small; ``fast_exact=True`` uses the mathematically exact recurrence
    r <- r - a·(Ap + lambda·p) instead.
    ``check_r0=True`` skips optimization entirely when |r0| < cconv, like the
    `single` optimizers (single.h:201-205); fixedL's cgrad has no such check.

    ``metrics=True`` additionally reports the INCOMING bond's per-true-label
    cost, n-correct, and reg term (pl0/ncor0/reg0) off the same first gradient
    pass — free [B, nl]-scale work.  Because the quadratic cost is GAUGE
    INVARIANT (moving the orthogonality center does not change any P_b), bond
    t+1's incoming metrics EQUAL bond t's post-split metrics, so fused sweeps
    can report the reference's per-bond post-SVD cost (fixedL.cc:532) without
    a dedicated post-split data pass — the engine shifts by one visit.
    """
    Bsz = LE.shape[0]
    Lphi, Rphi = _wing_products(LE, RE, xc, x1, mxu_dtype)
    Kl = 1 if LE.ndim == 2 else LE.shape[1]   # wings may arrive squeezed [B, m]
    Kr = 1 if RE.ndim == 2 else RE.shape[1]
    if _WING_BARRIER and Kl == 1 and Kr == 1:
        # The metrics-pass apply otherwise runs HBM-bound at 2.3x the loop
        # applies' time because wing production fuses into it
        # (.bench/profile_r3_ops_baseline.json); the barrier forces Lphi/Rphi
        # to materialize as their own fusion.  Measured -0.22 s/sweep on the
        # moving-label headline.  Label-on-core layouts ONLY (K_l == K_r == 1):
        # when the label rides a wing (fixed layout), Lphi is [B, nl, m, d] —
        # 565 MB f32 at the full set — and forcing it to materialize measured
        # 1.55x SLOWER on the blocked fixed engine (55.4 -> 85.9 s/sweep).
        Lphi, Rphi = lax.optimization_barrier((Lphi, Rphi))
    sig = jnp.exp(sigL + sigR)[:, None, None, None]          # [B,1,1,1]
    Y4 = Y.reshape(Bsz, Lphi.shape[1], B5.shape[4], Rphi.shape[1])

    def grad_and_cost(B):
        P = apply_bond(B, Lphi, Rphi) * sig
        dP = Y4 - P
        g = outer_grad(dP * sig, Lphi, Rphi)
        cost = jnp.sum(dP * dP) + lam * jnp.sum(B * B)
        return g - lam * B, cost

    with _prec_scope(_GRAD0_PRECISION):
      if metrics:
        P0 = apply_bond(B5, Lphi, Rphi) * sig
        dP0 = Y4 - P0
        g0 = outer_grad(dP0 * sig, Lphi, Rphi)
        r0 = g0 - lam * B5
        per_image = jnp.sum(dP0 * dP0, axis=(1, 2, 3))
        reg0 = lam * jnp.sum(B5 * B5)
        cost0 = jnp.sum(per_image) + reg0
        Pflat = P0.reshape(Bsz, -1)
        onehot = jax.nn.one_hot(labels, nl, dtype=per_image.dtype)
        pl0 = onehot.T @ per_image
        pred = jnp.argmax(jnp.abs(Pflat), axis=1)
        ncor0 = jnp.where(Pflat.shape[1] > 1,
                          jnp.sum((pred == labels).astype(jnp.int32)),
                          jnp.int32(0))
      else:
        r0, cost0 = grad_and_cost(B5)
        pl0 = jnp.zeros((nl,), jnp.float32)
        ncor0 = jnp.int32(-1)
        reg0 = jnp.float32(0.0)
    rr0 = jnp.sum(r0 * r0)

    class Carry(NamedTuple):
        i: jnp.ndarray
        B: jnp.ndarray
        r: jnp.ndarray
        p: jnp.ndarray
        rr: jnp.ndarray
        done: jnp.ndarray
        costs: jnp.ndarray
        rnorms: jnp.ndarray
        fcost: jnp.ndarray   # running quadcost via the line-search identity

    def cond(c: Carry):
        return (c.i < npass) & (~c.done)

    def body(c: Carry):
        pv = apply_bond(c.p, Lphi, Rphi) * sig
        pAp = jnp.sum(pv * pv) + lam * jnp.sum(c.p * c.p)
        alpha = c.rr / pAp
        Bn = c.B + alpha * c.p
        # exact-line-search decrease of the quadratic: f(Bn) = f(B) - a*|r|^2
        fcost = c.fcost - alpha * c.rr
        is_last = (c.i + 1) >= npass

        if fast:
            # sum_b (p·v_b) v_b (single.h:360); pv already carries one sig factor,
            # the outer product against the normalized wings needs the second.
            # Deliberately OUTSIDE the is_last cond: hoisting it into the tail
            # branch (to skip the discarded final-pass outer_grad) forces pv
            # [B, m·d·J] and the wing products to materialize in HBM as branch
            # operands instead of fusing into the matmuls — measured 2x SLOWER
            # end-to-end (18.1 vs 9.7 s/sweep at B=58,862).
            Ap = outer_grad(pv * sig, Lphi, Rphi)

        def tail(_):
            if fast and fast_exact:
                nr = c.r - alpha * (Ap + lam * c.p)
                cost = jnp.float32(0.0)
            elif fast:
                # reference formula nr = r - a*Ap - lambda*B_new (single.h:377-379)
                nr = c.r - alpha * Ap - lam * Bn
                cost = jnp.float32(0.0)
            else:
                nr, cost = grad_and_cost(Bn)
            nrr = jnp.sum(nr * nr)
            beta = nrr / c.rr
            pn = nr + beta * c.p
            done = jnp.sqrt(nrr) < cconv
            return nr, pn, nrr, cost, done

        def last(_):
            return c.r, c.p, c.rr, jnp.float32(0.0), jnp.bool_(True)

        nr, pn, nrr, cost, done = lax.cond(is_last, last, tail, None)
        costs = c.costs.at[c.i].set(cost)
        rnorms = c.rnorms.at[c.i].set(jnp.sqrt(nrr))
        return Carry(c.i + 1, Bn, nr, pn, nrr, done, costs, rnorms, fcost)

    def body_unrolled(c: Carry, is_last: bool):
        # Same math as `body`, but is_last is a PYTHON bool: the final pass's
        # branch resolves at trace time, so the dead Ap/outer_grad (and the
        # non-fast grad_and_cost) is simply never emitted — no lax.cond, no
        # forced materialization of its operands (see the note in `body`).
        pv = apply_bond(c.p, Lphi, Rphi) * sig
        pAp = jnp.sum(pv * pv) + lam * jnp.sum(c.p * c.p)
        alpha = c.rr / pAp
        Bn = c.B + alpha * c.p
        fcost = c.fcost - alpha * c.rr
        if is_last:
            nr, pn, nrr = c.r, c.p, c.rr
            cost, done = jnp.float32(0.0), jnp.bool_(True)
        else:
            if fast and fast_exact:
                Ap = outer_grad(pv * sig, Lphi, Rphi)
                nr = c.r - alpha * (Ap + lam * c.p)
                cost = jnp.float32(0.0)
            elif fast:
                Ap = outer_grad(pv * sig, Lphi, Rphi)
                nr = c.r - alpha * Ap - lam * Bn
                cost = jnp.float32(0.0)
            else:
                nr, cost = grad_and_cost(Bn)
            nrr = jnp.sum(nr * nr)
            beta = nrr / c.rr
            pn = nr + beta * c.p
            done = jnp.sqrt(nrr) < cconv
        costs = c.costs.at[c.i].set(cost)
        rnorms = c.rnorms.at[c.i].set(jnp.sqrt(nrr))
        return Carry(c.i + 1, Bn, nr, pn, nrr, done, costs, rnorms, fcost)

    done0 = jnp.sqrt(rr0) < cconv if check_r0 else jnp.bool_(False)
    init = Carry(jnp.int32(0), B5, r0, r0, rr0, done0,
                 jnp.zeros((npass,), jnp.float32), jnp.zeros((npass,), jnp.float32),
                 cost0)
    if unroll:
        out = init
        for i_static in range(npass):
            nxt = body_unrolled(out, (i_static + 1) >= npass)
            act = ~out.done
            # `done` masking preserves the while_loop's early-exit trajectory
            # exactly: once converged, every later pass's updates are discarded
            # (the loop would not have executed them at all).
            out = Carry(*(jnp.where(act, n, o) for n, o in zip(nxt, out)))
    else:
        out = lax.while_loop(cond, body, init)
    return CGResult(out.B, out.i, jnp.sqrt(rr0), out.costs, out.rnorms,
                    cost0, out.fcost, pl0, ncor0, reg0)


# ---------------------------------------------------------------------------
# monotone (reject-on-regress) bond acceptance
# ---------------------------------------------------------------------------


def monotone_accept(B5_old, nwl, nwr, rank, truncerr,
                    LE, sigL, RE, sigR, xc, x1, Y, labels, lam,
                    cutoff, maxm, minm, label_leg: str, iso_left: bool,
                    svd_method: str, mxu_dtype=None, nl: int = 10):
    """Per-bond monotone acceptance: reject the optimizer's update when its
    post-split cost exceeds the incoming bond's cost.

    The reference descends cost near-monotonically per bond and only *warns* when
    the SVD regresses it (fixedL.cc:523-533); at scale, CG overshoot at
    rank-saturated bonds turns those regressions into sweep-to-sweep oscillation.
    This generalizes the reference's experimental `replace` feature (README.md:76;
    dead code at fixedL.cc:512-514) to every layout: instead of reverting to the
    literal old cores (which only type-checks when the label does not move
    between the active pair), the REJECT candidate is the ORIGINAL bond tensor
    re-split with the same label routing and isometry side, so the sweep
    invariants (gauge, label transport) hold either way.

    Both candidates are compared by their measured POST-split cost.  This is
    essential in the moving-label layout: the label transport changes the split
    partition, and the old bond's rank along the NEW partition is not bounded by
    its inner bond — "keeping the old bond" still truncates, and comparing
    against the UN-split old cost silently accepts that unmeasured regression
    (observed as an ~10% within-sweep cost jump at rank-saturated bonds).

    Returns (nwl, nwr, rank, truncerr, cost, per_label, ncor, reg, rejected,
    cost_old); the reported metrics are those of the SELECTED candidate, and
    ``cost_old`` (the re-split old candidate's measured cost — the acceptance
    threshold) lands in the stats AUX slot so chain consistency of the per-bond
    costs is observable offline.
    """
    owl, owr, orank, otrunc = split_bond(B5_old, cutoff, maxm, minm,
                                         label_leg=label_leg,
                                         iso_left=iso_left, method=svd_method)
    newB = make_bond(nwl, nwr)
    oldB = make_bond(owl, owr)
    cost_new, pl_new, ncor_new, reg_new = quadcost(
        newB, LE, sigL, RE, sigR, xc, x1, Y, labels, lam, mxu_dtype=mxu_dtype,
        nl=nl)
    cost_old, pl_old, ncor_old, reg_old = quadcost(
        oldB, LE, sigL, RE, sigR, xc, x1, Y, labels, lam, mxu_dtype=mxu_dtype,
        nl=nl)
    rejected = cost_new > cost_old

    nwl = jnp.where(rejected, owl, nwl)
    nwr = jnp.where(rejected, owr, nwr)
    rank = jnp.where(rejected, orank, rank)
    truncerr = jnp.where(rejected, otrunc, truncerr)
    cost = jnp.where(rejected, cost_old, cost_new)
    per_label = jnp.where(rejected, pl_old, pl_new)
    ncor = jnp.where(rejected, ncor_old, ncor_new)
    reg = jnp.where(rejected, reg_old, reg_new)
    return nwl, nwr, rank, truncerr, cost, per_label, ncor, reg, rejected, \
        cost_old


# relative discarded-weight threshold below which a truncated split is treated
# as EXACT for acceptance purposes: at truncerr <= 1e-9 the split perturbs the
# bond by |e| <= 3e-5*|B| — the induced quadcost change is below the f32
# measurement noise of the quadcost pass it replaces, so the free pre-split
# value IS the measurement.  (cutoff defaults to 1e-10, so every bond whose
# rank did not saturate maxm lands under this threshold.)
_GATE_TRUNC_EPS = 1e-9


def monotone_accept_gated(B5_old, nwl, nwr, rank, truncerr,
                          LE, sigL, RE, sigR, xc, x1, Y, labels, lam,
                          cutoff, maxm, minm, label_leg: str, iso_left: bool,
                          svd_method: str, cost0, est_cost,
                          mxu_dtype=None, nl: int = 10):
    """monotone_accept with the dual quadcost data passes GATED on free bounds
    (round-5, VERDICT r4 items 3/weak-2 — the ungated form paid TWO full
    [B]-scale data passes per bond, ~1 CG-pass-equivalent, even though
    rejections are down to 1-5/sweep since the iso-aware split fix).

    The free quantities (both off the CG metrics/gradient pass):

    - ``cost0``  = quadcost of the INCOMING bond.  When the old bond's re-split
      truncates nothing (``otrunc <= eps``) the re-split is the identity up to
      fp, so the REJECT candidate's measured cost equals cost0 exactly — no
      pass needed.  In the fixed-label layout this is EVERY bond in steady
      state: B5_old has matrix rank <= its inner bond dim <= maxm along the
      unchanged partition.  (The moving layout's label transport changes the
      partition, so its saturated bonds still measure — the documented reason
      monotone compares post-split costs at all.)
    - ``est_cost`` = quadcost of the optimizer output via the exact CG
      line-search identity f(B_{i+1}) = f(B_i) - a_i|r_i|^2 (valid for
      'conj'/'fast_conj_exact' without damping — the caller enforces this).
      When the candidate's split truncates nothing (``truncerr <= eps``) the
      post-split cost equals est_cost to fp; at such bonds CG's guaranteed
      descent (est_cost <= cost0 by construction) makes the accept decision
      free as well.

    Only bonds with REAL truncation on a candidate pay that candidate's
    measured pass (a ``lax.cond`` — the branch operands LE/RE/x/Y are already
    materialized segment inputs, so no fusion is lost; cf. the cg_bond tail
    note about hoisting).

    Metrics reporting is the caller's job via shifted reporting (the selected
    candidate's post-split metrics are the NEXT visit's free incoming
    metrics), so this returns only the decision:
    (nwl, nwr, rank, truncerr, rejected, cost_sel, cost_old).
    """
    owl, owr, orank, otrunc = split_bond(B5_old, cutoff, maxm, minm,
                                         label_leg=label_leg,
                                         iso_left=iso_left, method=svd_method)
    newB = make_bond(nwl, nwr)
    oldB = make_bond(owl, owr)

    def measured(B):
        return quadcost(B, LE, sigL, RE, sigR, xc, x1, Y, labels, lam,
                        mxu_dtype=mxu_dtype, nl=nl)[0]

    cost_old = lax.cond(otrunc <= _GATE_TRUNC_EPS,
                        lambda B: cost0, measured, oldB)
    # certain-reject shortcut: est_cost is the candidate's PRE-truncation cost,
    # a lower bound on its post-split cost, so est_cost > cost_old already
    # decides the comparison — substituting est_cost for the measured value
    # yields the same (reject) decision without the data pass
    cost_new = lax.cond((truncerr <= _GATE_TRUNC_EPS)
                        | (est_cost > cost_old),
                        lambda B: est_cost, measured, newB)
    rejected = cost_new > cost_old
    nwl = jnp.where(rejected, owl, nwl)
    nwr = jnp.where(rejected, owr, nwr)
    rank = jnp.where(rejected, orank, rank)
    truncerr = jnp.where(rejected, otrunc, truncerr)
    cost_sel = jnp.where(rejected, cost_old, cost_new)
    return nwl, nwr, rank, truncerr, rejected, cost_sel, cost_old


# ---------------------------------------------------------------------------
# cost / accuracy reporting (quadcost, fixedL.cc:280-344)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mxu_dtype", "nl"))
def quadcost(B5, LE, sigL, RE, sigR, xc, x1, Y, labels, lam, mxu_dtype=None,
             nl: int = 10):
    """Returns (C_total, per_true_label_cost [nl], n_correct, reg_cost).

    ``labels`` [B] int32 true labels; per-label costs follow the reference: the FULL
    |dP|^2 of an image is charged to its true label's bucket (fixedL.cc:320).
    Accuracy: argmax over |P| (fixedL.cc:323-327).
    """
    Bsz = LE.shape[0]
    Lphi, Rphi = _wing_products(LE, RE, xc, x1, mxu_dtype)
    sig = jnp.exp(sigL + sigR)[:, None, None, None]
    P = apply_bond(B5, Lphi, Rphi) * sig
    Pflat = P.reshape(Bsz, -1)
    dP = Y - Pflat
    per_image = jnp.sum(dP * dP, axis=1)
    onehot_true = jax.nn.one_hot(labels, nl, dtype=per_image.dtype)
    per_label = onehot_true.T @ per_image
    pred = jnp.argmax(jnp.abs(Pflat), axis=1)
    ncor = jnp.where(Pflat.shape[1] > 1,
                     jnp.sum((pred == labels).astype(jnp.int32)),
                     jnp.int32(0))
    reg = lam * jnp.sum(B5 * B5)
    return jnp.sum(per_image) + reg, per_label, ncor, reg


# ---------------------------------------------------------------------------
# truncated SVD split (fixedL.cc:519-525 + ITensor cutoff semantics)
# ---------------------------------------------------------------------------


def _trunc_rank(s, cutoff, maxm, minm, total=None):
    """Smallest kept rank with tail(sum s^2) <= cutoff*total, clamped to [minm, maxm].

    ``total`` overrides sum(s^2) when ``s`` holds only the TOP singular values of a
    larger spectrum (the Ritz split): the exact total is trace(Gram), so the tail
    estimate stays exact-or-conservative (never under-reports truncation error).
    """
    p = s * s
    total = jnp.sum(p) if total is None else total
    k = s.shape[0]
    tail = total - jnp.cumsum(p)                      # tail[i] = discarded if keep i+1
    ok = tail <= cutoff * total
    r = jnp.where(jnp.any(ok), jnp.argmax(ok) + 1, k)
    r = jnp.maximum(r, jnp.minimum(minm, k))
    r = jnp.minimum(r, maxm)
    mask = jnp.arange(k) < r
    kept = jnp.sum(jnp.where(mask, p, 0.0))
    truncerr = jnp.where(total > 0, (total - kept) / total, 0.0)
    return r, mask, truncerr


def _polish_iso_right(left_m, right_m, mask):
    """Exact-orthonormalize a sinv-built RIGHT isometric factor.

    ``right_m`` ~ Vt was formed as sinv·(U^T M): its row errors scale like
    eps·sigma_max/sigma_i, catastrophic at rank-saturated bonds.  QR the rows
    (right_m^T = Q R, so right_m = R^T Q^T), keep Q^T as the isometry, absorb
    R^T into the sigma-carrying left factor — the product left·right is
    algebraically unchanged while the absorbed-into-wing factor becomes
    orthonormal to QR (backward-stable) accuracy.

    Masking: rows BEYOND the rank window are zeroed — exact, because the
    corresponding columns of the QR input are zero, which forces those rows of
    R to zero, so the dropped outer-product terms vanish identically.  Rows
    INSIDE the window (incl. minm-forced sv==0 directions) are kept even where
    they are arbitrary orthonormal completions — the same semantics LAPACK SVD
    gives zero singular values, and zeroing them would break product exactness
    (their R rows are generally nonzero)."""
    Q, R = jnp.linalg.qr(right_m.T)            # [cols, k] @ [k, k]
    iso = jnp.where(mask[:, None], Q.T, 0.0)
    return left_m @ R.T, iso


def _polish_iso_left(left_m, right_m, mask):
    """Mirror of _polish_iso_right for a sinv-built LEFT isometric factor:
    left_m = Q R, keep Q (rank-window masked) as the isometry, absorb R into
    the sigma-carrying right factor."""
    Q, R = jnp.linalg.qr(left_m)               # [rows, k] @ [k, k]
    iso = jnp.where(mask[None, :], Q, 0.0)
    return iso, R @ right_m


@partial(jax.jit, static_argnames=("label_leg", "iso_left", "method"))
def split_bond(B5, cutoff, maxm, minm, label_leg: str, iso_left: bool,
               method: str = "gram"):
    """split_bond with its matmuls optionally pinned to TNML_SPLIT_PRECISION
    (see the knob comment at the top of this module); the split is O(m^3) per
    bond — negligible next to the [B]-scale data passes — so pinning it to
    'highest' under a bf16 global policy costs nothing measurable."""
    with _prec_scope(_SPLIT_PRECISION):
        return _split_bond_impl(B5, cutoff, maxm, minm, label_leg, iso_left,
                                method)


def _split_bond_impl(B5, cutoff, maxm, minm, label_leg: str, iso_left: bool,
                     method: str = "gram"):
    """Split B5 back into two cores with adaptive-rank truncation.

    ``label_leg``: 'left' | 'right' | 'none' — which output core keeps the label axis
    (fixedL keeps it on the center core, fixedL.cc:519-521 via ITensor index
    partitioning).  ``iso_left``: the isometric (U) side is the left core when sweeping
    right, the right core when sweeping left (fixedL.cc:482-483,520-521).

    ``method='gram'`` (default) computes the SVD via an eigh of the small-side Gram
    matrix — ~250x faster than ``jnp.linalg.svd`` on TPU for the [m·d, d·m·L] bond
    matrices, with singular values accurate to ~1e-4 relative in f32 (directions that
    far down carry negligible weight and are what truncation discards anyway).  The
    Gram side is chosen so the ISOMETRIC factor comes out of eigh exactly orthonormal
    whenever the isometric side is the small side; the other factor is formed as an
    exact product (U^T M or M V), so the reconstructed W_c·W_{c+1} is always the exact
    rank-masked projection of B5.  ``method='svd'`` is the bit-faithful LAPACK-style
    path (reference parity, fixedL.cc:519-525).

    Returns (wl, wr, rank, truncerr); the new bond is zero-padded to the input pad so
    all downstream shapes stay static.
    """
    a, s, t, r, J = B5.shape
    pad = a
    if label_leg == "left":
        M = B5.transpose(0, 1, 4, 2, 3).reshape(a * s * J, t * r)
    else:
        # 'right' and 'none' (J==1) both fold the label into the columns
        M = B5.transpose(0, 1, 2, 3, 4).reshape(a * s, t * r * J)

    rows, cols = M.shape
    if method == "qr":
        # QR of the tall side + SVD of the small square factor: backward-stable
        # (does NOT square the condition number like the Gram path — f32-resolvable
        # singular values go down to ~1e-7*s_max instead of ~3e-4*s_max), while the
        # expensive decomposition shrinks from [rows, cols] to [k, k].  This is the
        # accuracy-critical path for the near-degenerate fixed-label regime where
        # the class signal rides on SMALL singular values.
        if rows <= cols:
            Q, R = jnp.linalg.qr(M.T)               # M = R^T Q^T
            U2, sv, Vt2 = jnp.linalg.svd(R.T)       # [rows, rows]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
            Um = U2 * mask[None, :]
            Vm = (Vt2 * mask[:, None]) @ Q.T
        else:
            Q, R = jnp.linalg.qr(M)
            U2, sv, Vt2 = jnp.linalg.svd(R)         # [cols, cols]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
            Um = Q @ (U2 * mask[None, :])
            Vm = Vt2 * mask[:, None]
        svm = sv * mask
        if iso_left:
            left_m, right_m = Um, svm[:, None] * Vm
        else:
            left_m, right_m = Um * svm[None, :], Vm
    elif method == "svd":
        U, sv, Vt = jnp.linalg.svd(M, full_matrices=False)
        rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
        Um = U * mask[None, :]
        Vm = Vt * mask[:, None]
        svm = sv * mask
        if iso_left:
            left_m, right_m = Um, svm[:, None] * Vm
        else:
            left_m, right_m = Um * svm[None, :], Vm
    elif method == "gram":
        # Gram side selection is ISO-AWARE (round-4 root cause of the fixed-
        # regime collapse, docs/DESIGN.md "Pseudo-isometry compounding"): when
        # the gram side is not the iso side, the isometric factor used to be
        # reconstructed as sinv·(U^T M) — a division by sigma that amplifies
        # matmul rounding by sigma_max/sigma_i.  Those pseudo-isometries get
        # absorbed into the wings and COMPOUND multiplicatively over the
        # ~780-bond half-sweep (measured: per-bond cost jumps of 2.8e3 at
        # precision=high, .bench/quality_fixn_high_r3.log).  Square (plain)
        # bonds now put the gram on the iso side outright — exact eigh
        # orthonormality at zero extra cost; rectangular (label) bonds that
        # must gram the small side repolish the sinv factor with a QR whose
        # triangular factor is absorbed into the sigma-carrying core (product
        # unchanged, isometry exact).
        use_rows = (rows < cols) or (rows == cols and iso_left)
        if use_rows:
            G = (M @ M.T).astype(jnp.float32)
            lam_, U = jnp.linalg.eigh(G)                  # ascending
            sv = jnp.sqrt(jnp.maximum(lam_[::-1], 0.0))
            U = U[:, ::-1]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
            Um = U * mask[None, :]
            UtM = Um.T @ M                                 # = s·Vt, exact
            if iso_left:
                left_m, right_m = Um, UtM
            else:
                sinv = jnp.where(sv > 0, 1.0 / jnp.maximum(sv, 1e-30), 0.0) * mask
                left_m = Um * (sv * mask)[None, :]
                right_m = sinv[:, None] * UtM
                left_m, right_m = _polish_iso_right(left_m, right_m, mask)
        else:
            G = (M.T @ M).astype(jnp.float32)
            lam_, V = jnp.linalg.eigh(G)
            sv = jnp.sqrt(jnp.maximum(lam_[::-1], 0.0))
            V = V[:, ::-1]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
            Vm = V * mask[None, :]
            MV = M @ Vm                                    # = U·s, exact
            if iso_left:
                sinv = jnp.where(sv > 0, 1.0 / jnp.maximum(sv, 1e-30), 0.0) * mask
                left_m = MV * sinv[None, :]
                right_m = (sv * mask)[:, None] * Vm.T
                left_m, right_m = _polish_iso_left(left_m, right_m, mask)
            else:
                left_m, right_m = MV, Vm.T
    elif method == "ritz":
        # Rayleigh–Ritz truncated split: the sweep keeps at most ``maxm`` of the
        # min(rows, cols) singular directions, so diagonalizing the FULL Gram
        # matrix wastes most of the eigh.  Project G onto a q-dimensional
        # (q = maxm+16, oversampled) subspace found by randomized subspace
        # iteration — TPU QR at these shapes is ~free (0.01-0.27 ms measured,
        # .bench/eigh_variants.py) while eigh scales steeply (1.65 ms at [240]
        # vs 0.5 ms at [136]) — then eigh the small projected matrix.  The
        # isometric factor Q@W is exactly orthonormal (QR ⊗ eigh orthonormality),
        # so the gauge/env math downstream stays exact; subspace suboptimality
        # only shows up honestly as truncation error, whose tail estimate uses
        # the EXACT total trace(G) (see _trunc_rank).  Power iterations on G
        # amplify sigma^2 per step (G = M·M^T), so 2 steps separate the kept
        # spectrum at sigma^6 — rapid dominance.
        k0 = min(rows, cols)
        # static rank target: engine pads maxm to `pad`, so pad is the live cap
        q = min(pad + 16, k0)
        # iso-aware side selection + QR polish: same rationale as 'gram'
        small_rows = (rows < cols) or (rows == cols and iso_left)
        G = ((M @ M.T) if small_rows else (M.T @ M)).astype(jnp.float32)
        total = jnp.trace(G)
        if q >= k0:                                   # tiny problem: plain eigh
            lam_, V = jnp.linalg.eigh(G)
            sv = jnp.sqrt(jnp.maximum(lam_[::-1], 0.0))
            V = V[:, ::-1]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm)
        else:
            Om = jax.random.normal(jax.random.PRNGKey(0), (k0, q), jnp.float32)
            Q, _ = jnp.linalg.qr(G @ Om)
            for _ in range(2):
                Q, _ = jnp.linalg.qr(G @ Q)
            T = Q.T @ (G @ Q)
            T = 0.5 * (T + T.T)
            theta, W = jnp.linalg.eigh(T)             # ascending
            sv = jnp.sqrt(jnp.maximum(theta[::-1], 0.0))
            V = (Q @ W)[:, ::-1]
            rank, mask, truncerr = _trunc_rank(sv, cutoff, maxm, minm,
                                               total=total)
        Vm = V * mask[None, :]
        if small_rows:
            UtM = Vm.T @ M                            # = s·Vt, exact
            if iso_left:
                left_m, right_m = Vm, UtM
            else:
                sinv = jnp.where(sv > 0, 1.0 / jnp.maximum(sv, 1e-30), 0.0) * mask
                left_m = Vm * (sv * mask)[None, :]
                right_m = sinv[:, None] * UtM
                left_m, right_m = _polish_iso_right(left_m, right_m, mask)
        else:
            MV = M @ Vm                               # = U·s, exact
            if iso_left:
                sinv = jnp.where(sv > 0, 1.0 / jnp.maximum(sv, 1e-30), 0.0) * mask
                left_m = MV * sinv[None, :]
                right_m = (sv * mask)[:, None] * Vm.T
                left_m, right_m = _polish_iso_left(left_m, right_m, mask)
            else:
                left_m, right_m = MV, Vm.T
    else:
        raise ValueError(
            f"split method {method!r} not recognized (gram|ritz|qr|svd)")
    k = sv.shape[0]

    # pad/trim the new bond to `pad`
    def fit_cols(Mx):
        return Mx[:, :pad] if k >= pad else jnp.pad(Mx, ((0, 0), (0, pad - k)))

    def fit_rows(Mx):
        return Mx[:pad, :] if k >= pad else jnp.pad(Mx, ((0, pad - k), (0, 0)))

    left_m, right_m = fit_cols(left_m), fit_rows(right_m)

    if label_leg == "left":
        wl = left_m.reshape(a, s, J, pad).transpose(0, 1, 3, 2)   # [a,s,new,J]
        wr = right_m.reshape(pad, t, r)
    elif label_leg == "right":
        wl = left_m.reshape(a, s, pad)
        wr = right_m.reshape(pad, t, r, J)
    else:
        wl = left_m.reshape(a, s, pad)
        wr = right_m.reshape(pad, t, r, J)[..., 0]
    rank = jnp.minimum(rank, pad)
    return wl, wr, rank, truncerr
