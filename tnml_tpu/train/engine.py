"""The DMRG-style sweep engine: batched bond optimization over a training set.

TPU-native re-design of the reference's ``mldmrg`` drivers (fixedL.cc:451-570,
single.h:523-728).  One engine serves both model families:

- fixedL:  W carries a 10-dim label axis on a fixed core (`label_site`); targets are
  one-hot rows.
- single:  no label axis; targets are {0,1} scalars for one chosen label
  (single.h:103).

The sweep over bonds is sequential (it is the algorithm); every per-bond step is ONE
fused async device call (`tnml_tpu.train.step.fused_bond_step`) over all images, so
the Python loop never blocks on the device.  Environments live in ``self.env`` — a
site-indexed table of device arrays, the HBM-resident analog of the reference's
``proj_images/B%03dE%05d`` disk files (fixedL.cc:115-120).  Per-bond metrics are
fetched in bulk once per sweep.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tnml_tpu.mps.pack import PackedMPS
from tnml_tpu.train import bond as bond_ops
from tnml_tpu.train import step as step_ops
from tnml_tpu.train.env import edge_env, env_extend
from tnml_tpu.train.envstore import DeviceEnvStore
from tnml_tpu.train.schedule import Sweeps, sweep_bonds

# the stats slots that carry "post-split" metrics; under shifted reporting
# (step.py shift_report) each row holds the INCOMING bond's values and the
# host moves the group back one visit (gauge invariance makes them equal)
def _metric_slots(nl: int):
    return [step_ops.S_COST, step_ops.S_NCOR, step_ops.S_REG] + \
        list(range(step_ops.S_PER_LABEL, step_ops.S_PER_LABEL + nl))


@dataclass
class BondStats:
    sweep: int
    b: int
    direction: int
    origm: int
    newm: int
    truncerr: float
    cost: float            # quadcost after SVD (sum over images, incl. reg)
    cost_pre: float        # quadcost of the optimizer output BEFORE the split
    ncorrect: int
    reg: float
    aux: float             # method-specific (pinv: cost of the sketched solution)
    replaced: bool         # the 'replace' feature reverted this bond
    per_label_cost: np.ndarray
    cg_passes: int
    cg_r0: float
    cg_costs: np.ndarray
    cg_rnorms: np.ndarray


class SweepEngine:
    def __init__(self,
                 model: PackedMPS,
                 X: np.ndarray,              # [B, N, d] float features (phi applied)
                 labels: np.ndarray,         # [B] int
                 *,
                 lam: float = 0.0,
                 alpha: float = 1.0,  # bond-update damping: B <- (1-a)B0 + a*Bcg
                 npass: int = 4,
                 cconv: float = 1e-10,
                 method: str = "conj",
                 pcut: float = 1e-8,
                 ntarget: int = 10,
                 replace: bool = False,
                 monotone: bool = False,  # reject-on-regress bond acceptance
                                          # (bond_ops.monotone_accept): per-bond
                                          # cost becomes non-increasing, killing
                                          # CG-overshoot oscillation at scale

                 target_label: Optional[int] = None,   # single-model mode
                 report_cost: bool = True,
                 label_mode: str = "fixed",
                 dtype=jnp.float32,
                 env_dtype=None,     # e.g. jnp.bfloat16: wing STORAGE dtype
                 mxu_dtype=None,     # e.g. jnp.bfloat16: MXU matmul input dtype
                                     # (accumulation always float32)
                 svd_method: str = "gram",   # 'gram' | 'ritz' (fastest, quality-
                                     # identical — bond.split_bond) | 'qr' | 'svd'
                 env_store=None,     # DeviceEnvStore (default) or OffloadEnvStore
                 x_site_major: bool = False,   # X already [N, B, d] on device
                 precision: Optional[str] = None,  # matmul precision: None ->
                                     # 'highest' (true f32; TPU DEFAULT rounds f32
                                     # operands to bf16, which stalls the near-
                                     # degenerate reference regime — see
                                     # utils/precision.py). 'default'/'high' trade
                                     # accuracy for MXU throughput; quality-verified
                                     # for the moving-label mode at scale.
                 fused_variant: str = "auto",  # fixed-label fused engine: 'auto'
                                     # (resident when the wing stacks fit HBM,
                                     # blocked otherwise) | 'resident' | 'blocked'
                 blocked_K: Optional[int] = None,  # blocked engine block size
                                     # (default ~sqrt(segment length))
                 sharding=None):
        from tnml_tpu.utils.precision import configure_matmul_precision
        self.precision = configure_matmul_precision(precision)
        # lifetime sweep counter: the apps drive one-sweep Sweeps objects in a
        # loop (per-sweep eval/checkpoint between calls), so sweep labels and
        # BondStats.sweep must continue across run()/run_fused() calls instead
        # of restarting at 1 (the reference numbers sweeps globally,
        # fixedL.cc:349)
        self.sweeps_done = 0
        n_axis = 0 if x_site_major else 1
        if X.ndim != 3 or X.shape[n_axis] != model.n:
            raise ValueError("X must be [B, N, d] matching the model length")
        if method not in ("conj", "fast_conj", "fast_conj_exact", "exact", "pinv"):
            raise ValueError(f'method type "{method}" not recognized')
        if method in ("exact", "pinv") and model.label_site is not None:
            # parity: fixedL supports conj only (fixedL.cc:504-505); the direct
            # solvers are single-model features (single.h:593-605)
            raise ValueError(f"method {method!r} requires the label-free model")
        self.model = model
        self.n = model.n
        self.nt = int(X.shape[1 if x_site_major else 0])
        self.pad = model.pad
        self.label_site = model.label_site
        self.lam = float(lam)
        self.alpha = float(alpha)
        self.npass = int(npass)
        self.cconv = float(cconv)
        self.method = method
        self.pcut = float(pcut)
        self.ntarget = int(ntarget)
        self.replace = bool(replace)
        self.monotone = bool(monotone)
        if self.replace and self.monotone:
            raise ValueError("replace and monotone acceptance are exclusive")
        self.noise = 0.0
        self._key_counter = 0
        self.report_cost = report_cost
        self.dtype = dtype
        self.env_dtype = env_dtype
        self.mxu_dtype = mxu_dtype
        self.svd_method = svd_method
        if fused_variant not in ("auto", "resident", "blocked"):
            raise ValueError("fused_variant must be auto|resident|blocked")
        self.fused_variant = fused_variant
        self.blocked_K = blocked_K
        self.sharding = sharding
        if label_mode not in ("fixed", "moving"):
            raise ValueError("label_mode must be 'fixed' or 'moving'")
        if label_mode == "moving":
            if model.label_site is None:
                raise ValueError("moving label mode needs a labeled MPS")
            if model.label_site > 1:
                raise ValueError("moving mode: move the label to site 0 or 1 "
                                 "before packing (MPS.move_label)")
        self.label_mode = label_mode

        # site-major features in [N, d, B] layout (lanes = batch; a [B, d] slice
        # pads d=2 lanes to 128 -> 64x HBM waste), split once into per-site [d, B]
        # device arrays so the bond loop never does an eager slice
        if x_site_major:
            xs = jnp.transpose(jnp.asarray(X, dtype=dtype), (0, 2, 1))
        else:
            xs = jnp.asarray(np.ascontiguousarray(np.transpose(X, (1, 2, 0))),
                             dtype=dtype)
        xs = self._shard(xs, batch_axis=2)
        self.Xsites = step_ops.split_sites(xs, self.n)
        self.labels = self._shard(jnp.asarray(labels, dtype=jnp.int32), batch_axis=0)
        if model.label_site is not None:
            if target_label is not None:
                raise ValueError("target_label is for label-free (single) models")
            nl = model.n_labels
            self.Y = self._shard(
                jnp.asarray(jax.nn.one_hot(labels, nl), dtype=dtype), batch_axis=0)
        else:
            if target_label is None:
                raise ValueError("label-free model needs target_label")
            y = (labels == target_label).astype(np.float32)[:, None]
            self.Y = self._shard(jnp.asarray(y, dtype=dtype), batch_axis=0)

        # width of the per-label stats block: the label axis for fixedL; the
        # number of distinct true-label classes for the label-free single model
        self.nl = model.n_labels if model.label_site is not None \
            else int(np.max(labels)) + 1
        self.cores: List[jnp.ndarray] = list(model.cores)
        if sharding is not None and hasattr(sharding, "shard_core"):
            # tensor-parallel-style bond-dimension sharding (TwoAxisParallel)
            self.cores = [sharding.shard_core(c) for c in self.cores]
        self.ranks = np.asarray(model.ranks).copy()
        self.env = env_store if env_store is not None else DeviceEnvStore()
        self._edge = None
        self._hot = None     # (site, f32 wing, sigma) of the last shifted env
        self._hyp_f = None   # [lambda, cconv, cutoff, pcut, noise, alpha]
        self._hyp_i = None   # [maxm, minm]
        self._schedule = None

    # -- helpers -------------------------------------------------------------

    def _shard(self, arr, batch_axis: int):
        if self.sharding is None:
            return arr
        return jax.device_put(arr, self.sharding.for_batch_axis(arr.ndim, batch_axis))

    def _edge_env(self):
        if self._edge is None:
            e = edge_env(self.nt, self.pad, self.dtype)
            self._edge = (self._shard(e[0], 0), self._shard(e[1], 0))
        return self._edge

    def _hot_or_get(self, site: int):
        """The wing produced by the immediately preceding bond step, in f32.

        The env table stores wings in ``env_dtype`` (bf16 halves the HBM); but
        re-quantizing the ACTIVE wing at every shift compounds rounding into a
        random walk over the N-site chain.  The freshly shifted wing is kept
        un-quantized in ``self._hot`` and preferred over the stored copy, so
        within a half-sweep the active chain never re-quantizes."""
        hot = self._hot
        if hot is not None and hot[0] == site:
            return hot[1], hot[2]
        return self.env.get(site)

    def _le(self, b: int):
        return self._hot_or_get(b - 1) if b >= 1 else self._edge_env()

    def _re(self, b: int):
        return self._hot_or_get(b + 2) if b + 2 <= self.n - 1 else self._edge_env()

    def set_hyper(self, cutoff: float, maxm: int, minm: int,
                  noise: float = 0.0) -> None:
        self._schedule = (float(cutoff), int(maxm), int(minm), float(noise))
        self.noise = float(noise)
        self._hyp_f = jnp.asarray([self.lam, self.cconv, cutoff, self.pcut, noise,
                                   self.alpha], jnp.float32)
        self._hyp_i = jnp.asarray([maxm, minm, self.ntarget], jnp.int32)

    def set_lambda(self, lam: float) -> None:
        """Hot-reload the regularizer (the LAMBDA control file, fixedL.cc:550-559).

        Takes effect from the next bond, mid-sweep, like the reference."""
        self.lam = float(lam)
        if getattr(self, "_schedule", None) is not None:
            self.set_hyper(*self._schedule)

    # -- environments ----------------------------------------------------------

    def init_envs(self) -> None:
        """Build all right wings, sites N-1 down to 2 (TrainStates::init,
        fixedL.cc:122-157).

        Device-resident stores get the whole table from ONE fused device call
        (init_wing_table); offload stores keep the incremental per-site path so
        wings can demote as they are produced (bounded HBM residency)."""
        self.env.clear()
        self._hot = None
        if type(self.env) is DeviceEnvStore:
            from tnml_tpu.train.env import init_wing_table

            c = self.label_site if self.label_site is not None else -1
            label_core = self.cores[c] if c >= 2 else None
            zeros = jnp.zeros_like(self.cores[0 if c != 0 else 1])
            # rank-4 rows can't stack; the label core rides separately (c >= 2)
            # or sits below the scanned range (c < 2) — zero its row either way
            rows = [self.cores[j] if self.cores[j].ndim == 3 else zeros
                    for j in range(self.n)]
            arrs, sigs = init_wing_table(jnp.stack(rows), label_core,
                                         jnp.stack(self.Xsites), c,
                                         env_dtype=self.env_dtype)
            for i, j in enumerate(range(2, self.n)):
                self.env.put(j, (arrs[i], sigs[i]))
            return
        prev = self._edge_env()
        for j in range(self.n - 1, 1, -1):
            prev = env_extend(prev[0], prev[1], self.Xsites[j], self.cores[j],
                              fromleft=False, out_dtype=self.env_dtype)
            self.env.put(j, prev)

    # -- per-bond step ---------------------------------------------------------

    def bond_tensor(self, b: int) -> jnp.ndarray:
        self._sync_fused()
        return bond_ops.make_bond(self.cores[b], self.cores[b + 1])

    def lowered_bond_hlo(self, b: int, direction: int) -> str:
        """Compiled HLO text of the fused bond step at bond b — lets callers
        assert that batch sharding actually turned the CG reductions into
        cross-chip collectives (SURVEY.md §5 distributed-backend row)."""
        le, re = self._le(b), self._re(b)
        case = bond_ops.bond_case(b, self.label_site)
        label_leg = {"coreL": "left", "coreR": "right"}.get(case, "none")
        key = np.asarray([0], dtype=np.uint32)
        lowered = step_ops.fused_bond_step.lower(
            self.cores[b], self.cores[b + 1], le[0], le[1], re[0], re[1],
            self.Xsites[b], self.Xsites[b + 1], self.Y, self.labels,
            self._hyp_f, self._hyp_i, key,
            label_leg=label_leg, iso_left=(direction > 0), method=self.method,
            npass=self.npass, check_r0=(self.label_site is None),
            report=self.report_cost, use_noise=False, ntarget=self.ntarget,
            env_dtype=None, mxu_dtype=self.mxu_dtype,
            svd_method=self.svd_method, replace=self.replace,
            damp=(self.alpha != 1.0), monotone=self.monotone, nl=self.nl)
        return lowered.compile().as_text()

    def quadcost(self, b: int = 0, B5: Optional[jnp.ndarray] = None):
        """(C_total, per_label, ncorrect, reg) at bond b with current wings."""
        if B5 is None:
            B5 = self.bond_tensor(b)
        le, re = self._le(b), self._re(b)
        return bond_ops.quadcost(B5, le[0], le[1], re[0], re[1],
                                 self.Xsites[b], self.Xsites[b + 1], self.Y,
                                 self.labels, jnp.float32(self.lam),
                                 nl=self.nl)

    def initial_report(self):
        """(cost, ncorrect) of the current model over the training set, without
        needing the env table — the fixedL pre-DMRG report (fixedL.cc:745) for
        engines whose wings live inside fused buffers."""
        from tnml_tpu.eval.fulltest import _contract_packed

        xs = jnp.stack(self.Xsites)
        P, sig = _contract_packed(self.packed(), xs, self.nt, self.dtype)
        P = np.asarray(P, np.float64) * np.exp(np.asarray(sig, np.float64))[:, None]
        Y = np.asarray(self.Y, np.float64)
        cost = float(((Y - P) ** 2).sum())
        cost += self.lam * float(np.sum(np.asarray(self.bond_tensor(0)) ** 2))
        labels = np.asarray(self.labels)
        ncor = int((np.abs(P).argmax(axis=1) == labels).sum()) if P.shape[1] > 1 \
            else 0
        return cost, ncor

    def bond_step_async(self, b: int, direction: int,
                    shift_report: bool = False):
        """Enqueue one fused bond step; returns the device stats vector."""
        le, re = self._le(b), self._re(b)
        case = bond_ops.bond_case(b, self.label_site)
        if self.label_mode == "moving":
            # invariant: the label always rides on one of the two active cores,
            # and the split sends it in the sweep direction (paper-style algorithm)
            if case not in ("coreL", "coreR"):
                raise RuntimeError(f"moving label lost: site {self.label_site}, bond {b}")
            label_leg = "right" if direction > 0 else "left"
        else:
            label_leg = {"coreL": "left", "coreR": "right"}.get(case, "none")
        # the key seeds pinv's random sketch only; for every other method pass
        # a cached DEVICE array — a fresh numpy key per bond is a host->device
        # upload, i.e. a full tunnel round-trip per bond on networked TPUs
        # (measured ~100 ms/bond of pure dispatch)
        if self.method == "pinv":
            self._key_counter += 1
            key = jnp.asarray([self._key_counter], dtype=jnp.uint32)
        else:
            if not hasattr(self, "_key0"):
                self._key0 = jnp.zeros((1,), jnp.uint32)
            key = self._key0
        wl, wr, env_arr, env_sig, stats = step_ops.fused_bond_step(
            self.cores[b], self.cores[b + 1],
            le[0], le[1], re[0], re[1],
            self.Xsites[b], self.Xsites[b + 1], self.Y, self.labels,
            self._hyp_f, self._hyp_i, key,
            label_leg=label_leg, iso_left=(direction > 0),
            method=self.method, npass=self.npass,
            check_r0=(self.label_site is None), report=self.report_cost,
            use_noise=(self.noise >= 1e-14), ntarget=self.ntarget,
            env_dtype=None, mxu_dtype=self.mxu_dtype,
            svd_method=self.svd_method, replace=self.replace,
            damp=(self.alpha != 1.0), monotone=self.monotone,
            shift_report=shift_report, nl=self.nl)
        if self.sharding is not None and hasattr(self.sharding, "shard_core"):
            # GSPMD may replicate jit outputs; re-pin the bond ('mp') sharding so
            # it survives the whole sweep (dryrun asserts this)
            wl, wr = self.sharding.shard_core(wl), self.sharding.shard_core(wr)
        self.cores[b], self.cores[b + 1] = wl, wr
        site = b if direction > 0 else b + 1
        if self.env_dtype is not None:
            from tnml_tpu.train.env import cast_wing
            self.env.put(site, (cast_wing(env_arr, self.env_dtype), env_sig))
            self._hot = (site, env_arr, env_sig)
        else:
            self.env.put(site, (env_arr, env_sig))
        if self.label_mode == "moving":
            self.label_site = b + 1 if direction > 0 else b
        return stats

    def bond_step(self, sweep_idx: int, b: int, direction: int,
                  maxm: int, minm: int, cutoff: float) -> BondStats:
        """Synchronous single-bond step (testing/debugging path)."""
        self.set_hyper(cutoff, maxm, minm)
        origm = int(self.ranks[b + 1])
        stats = self.bond_step_async(b, direction)
        st = self._unpack_stats(sweep_idx, b, direction, origm, np.asarray(stats))
        self.ranks[b + 1] = st.newm
        return st

    # -- full training loop ------------------------------------------------------

    @staticmethod
    def svd_regressed(st: BondStats) -> bool:
        """The reference's truncation-regression check: cost after the SVD split
        more than 10% above the optimizer's pre-split cost (fixedL.cc:523-533).
        A rejected/replaced bond kept the OLD tensor, so the comparison does not
        apply there."""
        return (not st.replaced and st.cost == st.cost
                and st.cost_pre == st.cost_pre and st.cost > 1.1 * st.cost_pre)

    def print_bond_report(self, st: BondStats) -> None:
        """Reference-style per-bond report (fixedL.cc:490,510,523-533)."""
        ha = 1 if st.direction > 0 else 2
        c = st.b if st.direction > 0 else st.b + 1
        print(f"Sweep {st.sweep} Half {ha} Bond {c + 1}")
        for i in range(st.cg_passes):
            print(f"  Conj grad pass {i + 1}")
            if st.cg_rnorms[i] > 0:
                print(f"  |r| = {st.cg_rnorms[i]:.1E}")
        print(f"SVD trunc err = {st.truncerr:.2E}")
        print(f"Original m={st.origm}, New m={st.newm}")
        if self.report_cost:
            if self.label_site is not None:
                for l in range(self.nl):
                    print(f"  Label l={l} C{l} = {st.per_label_cost[l] / self.nt:.10f}")
                print(f"  Reg. cost CR = {st.reg / self.nt:.10f}")
                ncor = st.ncorrect
                print(f"Percent correct = {ncor * 100.0 / self.nt:.4f}%, "
                      f"# incorrect = {self.nt - ncor}/{self.nt}")
            print(f"--> After SVD, Cost = {st.cost / self.nt:.10f}")
            if self.svd_regressed(st):
                # truncation undid the optimizer's gain at this bond
                # (fixedL.cc:523-533 check)
                print("WARNING: cost more than 10% larger after SVD "
                      f"({st.cost_pre / self.nt:.10f} -> "
                      f"{st.cost / self.nt:.10f})")

    def run(self, sweeps: Sweeps,
            callback: Optional[Callable[[BondStats], None]] = None,
            per_bond_hook: Optional[Callable[[int, int], None]] = None,
            verbose=True) -> List[BondStats]:
        """All sweeps over all bonds (mldmrg, fixedL.cc:451-570).

        ``verbose='bond'`` replays the reference's full per-bond report after each
        sweep's bulk stats fetch (the numbers are identical; only the moment they
        print differs from the reference's streaming output)."""
        self._reassert_precision()
        self._sync_fused()
        self._fs_state = None   # the per-bond loop mutates self.cores directly
        if not len(self.env):
            self.init_envs()
        history: List[BondStats] = []
        for sw in range(sweeps.nsweep):
            maxm = int(sweeps.maxm[sw])
            minm = int(sweeps.minm[sw])
            cutoff = float(sweeps.cutoff[sw])
            if maxm > self.pad:
                raise ValueError(f"sweep {sw}: maxm {maxm} exceeds padded dim {self.pad}")
            self.set_hyper(cutoff, maxm, minm, noise=float(sweeps.noise[sw]))
            self.sweeps_done += 1
            swno = self.sweeps_done
            # shifted reporting (step.py shift_report): free incoming-bond
            # metrics replace the dedicated post-split data pass per bond;
            # with monotone, gated acceptance rides the same pass (_shift_ok)
            shift = self._shift_ok()
            if verbose:
                print(f"\nSweep {swno} maxm={maxm} minm={minm} cutoff={cutoff:g}")
            t0 = time.perf_counter()
            pending = []
            for b, direction in sweep_bonds(self.n):
                origm = int(self.ranks[b + 1])
                stats = self.bond_step_async(b, direction, shift_report=shift)
                pending.append((swno, b, direction, origm, stats))
                if per_bond_hook is not None:
                    per_bond_hook(b, direction)
            # one bulk fetch per sweep
            fetched = np.asarray(jnp.stack([p[4] for p in pending]))
            dt = time.perf_counter() - t0
            if shift:
                slots = _metric_slots(self.nl)
                rows = fetched.copy()
                rows[:-1, slots] = fetched[1:, slots]
                cost, pl, ncor, reg = self._final_metrics_perbond()
                rows[-1, step_ops.S_COST] = cost
                rows[-1, step_ops.S_NCOR] = ncor
                rows[-1, step_ops.S_REG] = reg
                rows[-1, step_ops.S_PER_LABEL:step_ops.S_PER_LABEL + self.nl] = pl
                fetched = rows
            for (swi, b, direction, origm, _), vec in zip(pending, fetched):
                st = self._unpack_stats(swi, b, direction, origm, vec)
                self.ranks[b + 1] = st.newm
                history.append(st)
                if verbose == "bond":
                    self.print_bond_report(st)
                if callback is not None:
                    callback(st)
            if verbose:
                last = history[-1]
                nb = 2 * (self.n - 1)
                msg = (f"Sweep {swno} done in {dt:.2f}s "
                       f"({nb} bonds, "
                       f"{dt / nb * 1e3:.1f} ms/bond), "
                       f"max m = {int(self.ranks.max())}")
                if self.report_cost:
                    msg += f", cost/NT {last.cost / self.nt:.10f}"
                    if self.label_site is not None:
                        msg += f", correct {last.ncorrect}/{self.nt}"
                    nwarn = sum(map(self.svd_regressed, history[-nb:]))
                    if nwarn:
                        msg += f", svd-regressed bonds {nwarn}"
                    nrej = sum(st.replaced for st in history[-nb:])
                    if nrej:
                        msg += f", rejected bonds {nrej}"
                print(msg)
        return history

    def _unpack_stats(self, sweep, b, direction, origm, vec) -> BondStats:
        npass = self.npass
        s_cg = step_ops.s_cg(self.nl)
        replaced = bool(vec[step_ops.S_REPLACED] > 0.5)
        # `replace` reverts to the literal old cores (rank = origm); a monotone
        # rejection re-splits the old bond, so S_RANK is the true new rank
        return BondStats(
            sweep=sweep, b=b, direction=direction, origm=origm,
            newm=int(vec[step_ops.S_RANK]) if (self.monotone or not replaced)
            else origm,
            truncerr=float(vec[step_ops.S_TRUNCERR]),
            cost=float(vec[step_ops.S_COST]),
            cost_pre=float(vec[step_ops.S_COST_PRE]),
            ncorrect=int(vec[step_ops.S_NCOR]),
            reg=float(vec[step_ops.S_REG]),
            aux=float(vec[step_ops.S_AUX]),
            replaced=replaced,
            per_label_cost=vec[step_ops.S_PER_LABEL:
                               step_ops.S_PER_LABEL + self.nl].copy(),
            cg_passes=int(vec[step_ops.S_PASSES]),
            cg_r0=float(vec[step_ops.S_R0]),
            cg_costs=vec[s_cg:s_cg + npass].copy(),
            cg_rnorms=vec[s_cg + npass:s_cg + 2 * npass].copy(),
        )

    # -- scan-fused sweeps (all families) -----------------------------------------

    def _fused_supported(self) -> bool:
        if self.label_mode == "moving" or self.label_site is None:
            return True
        # fixed label: both scan segments must be non-empty
        return 2 <= self.label_site <= self.n - 3

    def _fused_init(self):
        """Set up the stacked ping-pong state for run_fused."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment as seg_ops

        n = self.n
        if self.label_site is None:
            carry = self.cores[0][..., None]          # J = 1
        else:
            if self.label_site != 0:
                raise ValueError("fused sweeps need the label on core 0")
            carry = self.cores[0]
        next_cores = jnp.stack([self.cores[j] for j in range(1, n)])
        xs = jnp.stack(self.Xsites)
        # bond-aligned right-wing stack (row t = far wing at bond t, edge included)
        opp, opp_sig = seg_ops.init_right_wings(next_cores, xs[1:],
                                                env_dtype=self.env_dtype)
        self._fs = {
            "carry": carry, "next_cores": next_cores,
            "opp": opp, "opp_sig": opp_sig,
            "xl": xs[:-1], "xr": xs[1:],
        }

    def run_fused(self, sweeps: Sweeps, verbose: bool = True) -> List[BondStats]:
        """Full sweeps as a handful of fused device calls each: two scan calls for
        the uniform families (segment.half_sweep), 4 scans + 4 center bonds for
        the fixed-label layout (segment_fixed)."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment as seg_ops

        if not self._fused_supported():
            raise ValueError("fused sweeps need a moving-label/single model or an "
                             "interior fixed label (2 <= c <= N-3)")
        if self.noise >= 1e-14 or self.method in ("exact", "pinv"):
            raise ValueError("fused sweeps support the CG methods without noise")
        self._reassert_precision()
        if self.label_mode == "fixed" and self.label_site is not None:
            if self._fixed_variant() == "blocked":
                return self._run_fused_blocked(sweeps, verbose=verbose)
            return self._run_fused_fixed(sweeps, verbose=verbose)
        if not hasattr(self, "_fs"):
            self._fused_init()
        fs = self._fs
        n = self.n
        history: List[BondStats] = []
        # shifted reporting: free incoming-bond metrics instead of a dedicated
        # post-split data pass per bond (see _shift_visit_metrics)
        shift = self._shift_ok()
        common = dict(method=self.method, npass=self.npass,
                      check_r0=(self.label_site is None),
                      report=self.report_cost, env_dtype=self.env_dtype,
                      mxu_dtype=self.mxu_dtype, svd_method=self.svd_method,
                      damp=(self.alpha != 1.0), monotone=self.monotone,
                      shift_report=shift, nl=self.nl)
        for sw in range(sweeps.nsweep):
            maxm = int(sweeps.maxm[sw])
            minm = int(sweeps.minm[sw])
            cutoff = float(sweeps.cutoff[sw])
            if maxm > self.pad:
                raise ValueError(f"sweep {sw}: maxm {maxm} exceeds pad {self.pad}")
            if float(sweeps.noise[sw]) >= 1e-14:
                raise ValueError("fused sweeps do not support the noise term; "
                                 "use the per-bond engine (run)")
            self.set_hyper(cutoff, maxm, minm, noise=float(sweeps.noise[sw]))
            self.sweeps_done += 1
            swno = self.sweeps_done
            t0 = time.perf_counter()
            # bond-aligned ping-pong: each half-sweep's ys ARE the next one's xs
            fwd = seg_ops.half_sweep(fs["carry"], fs["next_cores"], fs["opp"],
                                     fs["opp_sig"], fs["xl"], fs["xr"],
                                     self.Y, self.labels, self._hyp_f,
                                     self._hyp_i, forward=True, **common)
            bwd = seg_ops.half_sweep(fwd.carry_core, fwd.cores, fwd.env_arr,
                                     fwd.env_sig, fs["xl"], fs["xr"],
                                     self.Y, self.labels, self._hyp_f,
                                     self._hyp_i, forward=False, **common)
            fs["carry"] = bwd.carry_core
            fs["next_cores"] = bwd.cores
            fs["opp"] = bwd.env_arr
            fs["opp_sig"] = bwd.env_sig

            fwd_stats = np.asarray(fwd.stats)
            bwd_stats = np.asarray(bwd.stats)
            dt = time.perf_counter() - t0
            visit = [(b, +1, fwd_stats[b]) for b in range(n - 1)] + \
                    [(b, -1, bwd_stats[b]) for b in range(n - 2, -1, -1)]
            if shift:
                visit = self._shift_visit_metrics(visit)
            for b, direction, vec in visit:
                st = self._unpack_stats(swno, b, direction,
                                        int(self.ranks[b + 1]), vec)
                self.ranks[b + 1] = st.newm
                history.append(st)
                if verbose == "bond":
                    self.print_bond_report(st)
            if verbose:
                last = history[-1]
                n_bonds = len(visit)
                msg = (f"Sweep {swno} done in {dt:.2f}s "
                       f"(fused, {n_bonds} bonds, "
                       f"{dt / n_bonds * 1e3:.1f} ms/bond), "
                       f"max m = {int(self.ranks.max())}")
                if self.report_cost:
                    msg += f", cost/NT {last.cost / self.nt:.10f}"
                    if self.label_site is not None:
                        msg += f", correct {last.ncorrect}/{self.nt}"
                    nwarn = sum(map(self.svd_regressed, history[-n_bonds:]))
                    if nwarn:
                        msg += f", svd-regressed bonds {nwarn}"
                    nrej = sum(st.replaced for st in history[-n_bonds:])
                    if nrej:
                        msg += f", rejected bonds {nrej}"
                print(msg)
        self._fused_dirty = "moving"
        self._fs_state = "moving"
        return history

    def _final_metrics_perbond(self):
        """Explicit quadcost at the sweep's final bond (bond 0), env-store
        wings — one device call closing the shifted-report chain."""
        cost, pl, ncor, reg = jax.device_get(self.quadcost(0))
        return (float(cost), np.asarray(pl, np.float32), float(ncor),
                float(reg))

    def _shift_visit_metrics(self, visit, final_fn=None):
        """Shifted reporting (segment.py/step.py shift_report): each fused stats
        row carries the INCOMING bond's (cost, ncor, per-label, reg) — by gauge
        invariance exactly the PREVIOUS visit's post-split metrics.  Shift the
        metric group back one visit; the final visit's metrics come from one
        explicit quadcost on the final fused state (one device call per sweep
        instead of one post-split data pass per bond)."""
        if final_fn is None:
            final_fn = self._fused_final_metrics
        out = []
        slots = _metric_slots(self.nl)
        for k, (b, direction, vec) in enumerate(visit):
            vec = vec.copy()
            if k + 1 < len(visit):
                vec[slots] = visit[k + 1][2][slots]
            else:
                cost, pl, ncor, reg = final_fn()
                vec[step_ops.S_COST] = cost
                vec[step_ops.S_NCOR] = ncor
                vec[step_ops.S_REG] = reg
                vec[step_ops.S_PER_LABEL:step_ops.S_PER_LABEL + self.nl] = pl
            out.append((b, direction, vec))
        return out

    def _fused_final_metrics(self):
        """Quadcost of the final fused state at bond 0 (moving layout: the
        labelled carry core is core 0 after a backward half-sweep)."""
        import jax.numpy as jnp

        fs = self._fs
        B5 = bond_ops.make_bond(fs["carry"], fs["next_cores"][0])
        e_arr, e_sig = self._edge_env()
        cost, pl, ncor, reg = jax.device_get(bond_ops.quadcost(
            B5, e_arr, e_sig, fs["opp"][0], fs["opp_sig"][0],
            fs["xl"][0], fs["xr"][0], self.Y, self.labels,
            jnp.float32(self.lam), nl=self.nl))
        return (float(cost), np.asarray(pl, np.float32), float(ncor),
                float(reg))

    def _fused_final_metrics_fixed(self):
        """Quadcost of the final FIXED-layout fused state at bond 0: after the
        backward half-sweep, lab_buf[0] is the labelled right wing covering
        sites 2..N-1 (current cores — emitted as the bond-0 carry-in), and the
        travelling core sits at site 0."""
        import jax.numpy as jnp

        fx = self._fsx
        B5 = bond_ops.make_bond(fx["trav"], fx["cores_st"][1])
        e_arr, e_sig = self._edge_env()
        cost, pl, ncor, reg = jax.device_get(bond_ops.quadcost(
            B5, e_arr, e_sig, fx["lab_buf"][0], fx["lab_sig"][0],
            self.Xsites[0], self.Xsites[1], self.Y, self.labels,
            jnp.float32(self.lam), nl=self.nl))
        return (float(cost), np.asarray(pl, np.float32), float(ncor),
                float(reg))

    def fused_eval_stacks(self):
        """(pre, label_core, post) device stacks of the CURRENT model straight
        from the fused buffers — no host round-trip — or None when the fused
        state is not the source of truth.  Feeds eval.fulltest's batched
        contraction (Evaluator.evaluate_engine)."""
        state = getattr(self, "_fs_state", None)
        if state == "moving":
            fs = self._fs
            pre = jnp.zeros((0, self.pad, fs["carry"].shape[1], self.pad),
                            self.dtype)
            return pre, fs["carry"], fs["next_cores"]
        if state == "fixed":
            fx = self._fsx
            c = self.label_site
            pre = jnp.concatenate([fx["trav"][None], fx["cores_st"][1:c]])
            return pre, fx["label_core"], fx["cores_st"][c + 1:]
        return None

    def _fused_writeback(self) -> None:
        """Sync the stacked fused state back into self.cores (label at core 0)."""
        import jax.numpy as jnp

        fs = self._fs
        carry = np.asarray(fs["carry"])
        if self.label_site is None:
            self.cores[0] = carry[..., 0]
        else:
            self.cores[0] = carry
            self.label_site = 0
        nxt = np.asarray(fs["next_cores"])   # one bulk fetch, then host slices
        for j in range(1, self.n):
            self.cores[j] = nxt[j - 1]

    # -- scan-fused sweeps, FIXED-label layout (segment_fixed.py) -----------------

    def _fused_init_fixed(self):
        import jax.numpy as jnp
        from tnml_tpu.train import segment_fixed as segf

        self._sync_fused()   # a prior (e.g. blocked) fused run may be dirty
        c = self.label_site
        # preflight the dominant buffer instead of dying in the compiler: the
        # bond-aligned labelled wing buffer is R x [B, nl, pad].  Sizing +
        # budget come from train/memmodel.py (the single copy), per chip.
        from tnml_tpu.train import memmodel
        nl = self.model.n_labels or 10
        itemsize = jnp.dtype(self.env_dtype or self.dtype).itemsize
        chips = memmodel.shard_count(self.sharding)
        sz = memmodel.fixed_layout_bytes(-(-self.nt // chips), self.pad, nl,
                                         c, self.n, itemsize)
        budget = memmodel.fused_budget_bytes()
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if sz["total"] > budget and on_tpu:
            raise ValueError(
                f"fixed-label fused buffers need ~{sz['total'] / 2**30:.1f} GB"
                f"/chip ({sz['labelled'] / 2**30:.1f} GB labelled wings + "
                f"{sz['plain'] / 2**30:.1f} GB plain; batch over {chips} "
                f"chip(s)) — beyond the ~{budget / 2**30:.1f} GB wing budget. "
                "Shard the batch over a mesh (dp=...), reduce Ntrain/pad, use "
                "the blocked engine (fused_variant='blocked'), or run "
                "out-of-core via the per-bond engine with offload=host|spool "
                "(the reference's Nbatch semantics).")
        # site-aligned plain core stack; the label core (rank 4) rides separately
        zeros = jnp.zeros_like(self.cores[0 if c != 0 else 1])
        rows = [self.cores[j] if j != c else zeros for j in range(self.n)]
        cores_st = jnp.stack(rows)
        xs = jnp.stack(self.Xsites)
        lab_buf, lab_sig, pl_buf, pl_sig = segf.init_fixed_wings(
            cores_st, self.cores[c], xs, self.nt, c, env_dtype=self.env_dtype)
        self._fsx = {
            "trav": self.cores[0], "cores_st": cores_st,
            "label_core": self.cores[c],
            "lab_buf": lab_buf, "lab_sig": lab_sig,
            "pl_buf": pl_buf, "pl_sig": pl_sig, "xs": xs,
        }

    def _run_fused_fixed(self, sweeps: Sweeps, verbose=True) -> List[BondStats]:
        import jax.numpy as jnp
        from tnml_tpu.train import segment_fixed as segf
        from tnml_tpu.train.env import edge_env

        if not hasattr(self, "_fsx") or self._fsx.get("blocked"):
            self._fused_init_fixed()
        fx = self._fsx
        n, c = self.n, self.label_site
        shift = self._shift_ok()
        common = dict(method=self.method, npass=self.npass,
                      report=self.report_cost, env_dtype=self.env_dtype,
                      mxu_dtype=self.mxu_dtype, svd_method=self.svd_method,
                      damp=(self.alpha != 1.0), monotone=self.monotone,
                      shift_report=shift, nl=self.nl)
        history: List[BondStats] = []
        for sw in range(sweeps.nsweep):
            maxm = int(sweeps.maxm[sw])
            minm = int(sweeps.minm[sw])
            cutoff = float(sweeps.cutoff[sw])
            if maxm > self.pad:
                raise ValueError(f"sweep {sw}: maxm {maxm} exceeds pad {self.pad}")
            if float(sweeps.noise[sw]) >= 1e-14:
                raise ValueError("fused sweeps do not support the noise term; "
                                 "use the per-bond engine (run)")
            self.set_hyper(cutoff, maxm, minm, noise=float(sweeps.noise[sw]))
            self.sweeps_done += 1
            swno = self.sweeps_done
            t0 = time.perf_counter()
            visit = []
            for forward in (True, False):
                visit += self._fused_fixed_half(fx, forward, common)
            fetched = np.asarray(jnp.stack([v[2] for v in visit]))
            visit = [(b, d, row) for (b, d, _), row in zip(visit, fetched)]
            if shift:
                visit = self._shift_visit_metrics(
                    visit, final_fn=self._fused_final_metrics_fixed)
            dt = time.perf_counter() - t0
            for b, direction, vec in visit:
                st = self._unpack_stats(swno, b, direction,
                                        int(self.ranks[b + 1]), vec)
                self.ranks[b + 1] = st.newm
                history.append(st)
                if verbose == "bond":
                    self.print_bond_report(st)
            if verbose:
                last = history[-1]
                msg = (f"Sweep {swno} done in {dt:.2f}s "
                       f"(fused-fixed, {len(visit)} bonds, "
                       f"{dt / len(visit) * 1e3:.1f} ms/bond), "
                       f"max m = {int(self.ranks.max())}")
                if self.report_cost:
                    msg += (f", cost/NT {last.cost / self.nt:.10f}"
                            f", correct {last.ncorrect}/{self.nt}")
                    nwarn = sum(map(self.svd_regressed, history[-len(visit):]))
                    if nwarn:
                        msg += f", svd-regressed bonds {nwarn}"
                    nrej = sum(st.replaced for st in history[-len(visit):])
                    if nrej:
                        msg += f", rejected bonds {nrej}"
                print(msg)
        self._fused_dirty = "fixed"
        self._fs_state = "fixed"
        return history

    def _fused_fixed_half(self, fx, forward: bool, common):
        """One half-sweep: segA | bond c-1 | bond c | segB (forward) or the
        mirror order (backward).  Returns [(bond, direction, stats_row), ...] in
        visit order."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment_fixed as segf
        from tnml_tpu.train.env import edge_env

        n, c = self.n, self.label_site
        direction = 1 if forward else -1
        # f32: the near wing is the segments' fori_loop CARRY (stored stack rows
        # quantize at emission; re-quantizing the carry compounds bf16 rounding)
        e_arr, e_sig = edge_env(self.nt, self.pad, self.dtype)
        e_arr, e_sig = self._shard(e_arr, 0), self._shard(e_sig, 0)
        seg = lambda **kw: segf.fixed_segment(
            fx["cores_st"], kw.pop("cur"), kw.pop("near_arr"),
            kw.pop("near_sig"), kw.pop("far_buf"), kw.pop("emit_buf"),
            kw.pop("emit_sig"), kw.pop("far_sig"), fx["xs"], self.Y,
            self.labels, self._hyp_f, self._hyp_i, forward=forward,
            **kw, **common)

        def center(t, wl, wr, near_arr, near_sig, label_leg):
            out = segf.center_step(
                wl, wr, near_arr, near_sig, fx["pl_buf"], fx["pl_sig"],
                self.Xsites[t], self.Xsites[t + 1], self.Y, self.labels,
                self._hyp_f, self._hyp_i, t=t, label_leg=label_leg,
                forward=forward, **common)
            nwl, nwr, env_arr, env_sig, fx["pl_buf"], fx["pl_sig"], stats = out
            return nwl, nwr, env_arr, env_sig, stats

        visit = []
        if forward:
            rA = seg(cur=fx["trav"], near_arr=e_arr, near_sig=e_sig,
                     far_buf=fx["lab_buf"], far_sig=fx["lab_sig"],
                     emit_buf=fx["pl_buf"], emit_sig=fx["pl_sig"],
                     t0=0, T=c - 1, far_off=0, emit_off=0)
            fx["cores_st"], fx["pl_buf"], fx["pl_sig"] = (
                rA.cores_st, rA.emit_buf, rA.emit_sig)
            visit += [(t, direction, rA.stats[t]) for t in range(c - 1)]
            # bond c-1: (plain, label) pair; label stays right
            nwl, nwr, env_a, env_s, st1 = center(
                c - 1, rA.cur_core, fx["label_core"], rA.near_arr, rA.near_sig,
                "right")
            fx["cores_st"] = fx["cores_st"].at[c - 1].set(nwl)
            visit.append((c - 1, direction, st1))
            # bond c: (label, plain) pair; label stays left; iso side = label core
            nwl2, nwr2, env_a2, env_s2, st2 = center(
                c, nwr, fx["cores_st"][c + 1], env_a, env_s, "left")
            fx["label_core"] = nwl2
            visit.append((c, direction, st2))
            rB = seg(cur=nwr2, near_arr=env_a2, near_sig=env_s2,
                     far_buf=fx["pl_buf"], far_sig=fx["pl_sig"],
                     emit_buf=fx["lab_buf"], emit_sig=fx["lab_sig"],
                     t0=c + 1, T=n - 2 - c, far_off=0, emit_off=c + 1)
            fx["cores_st"], fx["lab_buf"], fx["lab_sig"] = (
                rB.cores_st, rB.emit_buf, rB.emit_sig)
            fx["trav"] = rB.cur_core
            visit += [(c + 1 + i, direction, rB.stats[i])
                      for i in range(n - 2 - c)]
        else:
            rB = seg(cur=fx["trav"], near_arr=e_arr, near_sig=e_sig,
                     far_buf=fx["lab_buf"], far_sig=fx["lab_sig"],
                     emit_buf=fx["pl_buf"], emit_sig=fx["pl_sig"],
                     t0=c + 1, T=n - 2 - c, far_off=c + 1, emit_off=0)
            fx["cores_st"], fx["pl_buf"], fx["pl_sig"] = (
                rB.cores_st, rB.emit_buf, rB.emit_sig)
            visit += [(n - 2 - i, direction, rB.stats[n - 2 - c - 1 - i])
                      for i in range(n - 2 - c)]
            # bond c: (label, plain) pair; iso side = plain right core
            nwl, nwr, env_a, env_s, st1 = center(
                c, fx["label_core"], rB.cur_core, rB.near_arr, rB.near_sig,
                "left")
            fx["cores_st"] = fx["cores_st"].at[c + 1].set(nwr)
            visit.append((c, direction, st1))
            # bond c-1: (plain, label) pair; iso side = label core
            nwl2, nwr2, env_a2, env_s2, st2 = center(
                c - 1, fx["cores_st"][c - 1], nwl, env_a, env_s, "right")
            fx["label_core"] = nwr2
            visit.append((c - 1, direction, st2))
            rA = seg(cur=nwl2, near_arr=env_a2, near_sig=env_s2,
                     far_buf=fx["pl_buf"], far_sig=fx["pl_sig"],
                     emit_buf=fx["lab_buf"], emit_sig=fx["lab_sig"],
                     t0=0, T=c - 1, far_off=0, emit_off=0)
            fx["cores_st"], fx["lab_buf"], fx["lab_sig"] = (
                rA.cores_st, rA.emit_buf, rA.emit_sig)
            fx["trav"] = rA.cur_core
            visit += [(c - 2 - i, direction, rA.stats[c - 2 - i])
                      for i in range(c - 1)]
        return visit

    def _fused_writeback_fixed(self) -> None:
        fx = self._fsx
        c = self.label_site
        st = np.asarray(fx["cores_st"])
        for j in range(self.n):
            if j == c:
                self.cores[j] = np.asarray(fx["label_core"])
            elif j == 0:
                self.cores[j] = np.asarray(fx["trav"])
            else:
                self.cores[j] = st[j]

    # -- blocked (sqrt-memory) fused sweeps, FIXED layout (segment_blocked.py) ----

    def _fixed_variant(self) -> str:
        """Resolve the fixed-label fused engine variant: the resident engine
        (full bond-aligned wing stacks, segment_fixed) when they fit one chip,
        the checkpointed-rebuild blocked engine (segment_blocked) otherwise.
        TNML_FUSED_VARIANT=resident|blocked overrides the auto choice.
        Sizing and budget live in train/memmodel.py (the single copy); the
        footprint is per-chip, so a dp-sharded batch keeps the resident
        engine proportionally longer."""
        import os
        from tnml_tpu.train import memmodel
        v = self.fused_variant
        if v == "auto":
            v = os.environ.get("TNML_FUSED_VARIANT", "auto")
        if v != "auto":
            return v
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if not on_tpu:
            return "resident"   # test backends: no 16 GB HBM ceiling
        itemsize = jnp.dtype(self.env_dtype or self.dtype).itemsize
        size_pad = max(self.pad, getattr(self, "sizing_pad", 0) or 0)
        total = memmodel.per_chip_total(self.nt, size_pad,
                                        self.model.n_labels or 10,
                                        self.label_site, self.n, itemsize,
                                        self.sharding)
        if total > memmodel.fused_budget_bytes():
            return "blocked"
        return "resident"

    @staticmethod
    def _pick_block(length: int, target: Optional[int] = None) -> int:
        """Block size for a segment of ``length`` bonds: ~sqrt(length) (the
        boundary-count/rebuild-buffer memory optimum), preferring an exact
        divisor so every block compiles to the same static T."""
        import math
        if length <= 1:
            return max(length, 1)
        k = target or max(2, round(math.sqrt(length)))
        best = min((d for d in range(max(2, k // 2), min(length, 2 * k) + 1)
                    if length % d == 0), key=lambda d: abs(d - k), default=k)
        return best

    def _q_wing(self, arr, sig):
        """Quantize a boundary wing to the storage dtype (quantize-once: the
        f32 carry is stored once; rebuilds run in f32 from the stored row)."""
        dt = self.env_dtype
        return (arr if dt is None else arr.astype(dt)), sig

    def _fused_init_blocked(self):
        """Stacked state + initial right-wing block boundaries for the blocked
        fixed-label engine.  Instead of the resident engine's full bond-aligned
        stacks (R labelled rows), only one boundary wing per K-bond block is
        kept; blocked_segment rebuilds the block's rows in-jit.  The initial
        boundaries come from one right-to-left walk over the cold cores
        (TrainStates::init, fixedL.cc:122-157), recording at the block marks."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment_blocked as segb
        from tnml_tpu.train.env import edge_env, env_extend

        self._sync_fused()
        c, n = self.label_site, self.n
        # run_fused guards this via _fused_supported; assert here too so a
        # direct _run_fused_blocked call on a degenerate layout fails loudly
        # instead of IndexError-ing on empty block lists later (advisor r3)
        if not 2 <= c <= n - 3:
            raise ValueError(
                f"blocked fixed-label engine needs an interior label site "
                f"(2 <= c <= N-3); got c={c}, N={n} — use the per-bond engine "
                "(run) for edge label sites")
        K = self.blocked_K or self._pick_block(max(c - 1, n - 2 - c))
        blocksA = segb.partition_bonds(0, c - 1, self._pick_block(c - 1, K))
        blocksB = segb.partition_bonds(c + 1, n - 1,
                                       self._pick_block(n - 2 - c, K))
        zeros = jnp.zeros_like(self.cores[0 if c != 0 else 1])
        rows = [self.cores[j] if j != c else zeros for j in range(n)]
        cores_st = jnp.stack(rows)
        xs = jnp.stack(self.Xsites)

        car_a, car_s = edge_env(self.nt, self.pad, jnp.float32)
        car_a, car_s = self._shard(car_a, 0), self._shard(car_s, 0)
        cur_s = n   # carry covers sites cur_s..n-1

        def down_to(a, s, target, from_s):
            if from_s > target:
                a, s = segb.extend_run(a, s, cores_st, xs, from_s - 1,
                                       T=from_s - target, fromleft=False)
            return a, s

        fwd_B = [None] * len(blocksB)
        for j in reversed(range(len(blocksB))):
            t0, T = blocksB[j]
            car_a, car_s = down_to(car_a, car_s, t0 + T + 1, cur_s)
            cur_s = t0 + T + 1
            fwd_B[j] = self._q_wing(car_a, car_s)
        car_a, car_s = down_to(car_a, car_s, c + 2, cur_s)
        fwd_c = self._q_wing(car_a, car_s)
        car_a, car_s = down_to(car_a, car_s, c + 1, c + 2)
        fwd_c1 = self._q_wing(car_a, car_s)
        # cross the label core (site c): the carry picks up the label axis
        car_a, car_s = env_extend(car_a, car_s, self.Xsites[c], self.cores[c],
                                  fromleft=False)
        cur_s = c
        fwd_A = [None] * len(blocksA)
        for j in reversed(range(len(blocksA))):
            t0, T = blocksA[j]
            car_a, car_s = down_to(car_a, car_s, t0 + T + 1, cur_s)
            cur_s = t0 + T + 1
            fwd_A[j] = self._q_wing(car_a, car_s)
        self._fsx = {
            "blocked": True, "trav": self.cores[0], "cores_st": cores_st,
            "label_core": self.cores[c], "xs": xs,
            "blocksA": blocksA, "blocksB": blocksB,
            "fwd_A": fwd_A, "fwd_c1": fwd_c1, "fwd_c": fwd_c, "fwd_B": fwd_B,
            "bwd_A": None, "bwd_c1": None, "bwd_c": None, "bwd_B": None,
        }

    def _run_fused_blocked(self, sweeps: Sweeps, verbose=True) -> List[BondStats]:
        """Full sweeps with sqrt-style wing memory: each direction's block-entry
        near-wing carries ARE the opposite direction's block boundaries (the
        ping-pong invariant of segment_fixed, restricted to block marks), so no
        emission buffers exist at all — only ~R/K boundary rows plus the in-jit
        K-row rebuild buffer.  This is what makes the reference's flagship
        layout (fixedL.cc:616) trainable at the full 58,862-image set on one
        chip (the resident engine's labelled stack alone would need ~55 GB)."""
        import jax.numpy as jnp

        if not hasattr(self, "_fsx") or not self._fsx.get("blocked"):
            self._fused_init_blocked()
        fb = self._fsx
        shift = self._shift_ok()
        common = dict(method=self.method, npass=self.npass,
                      report=self.report_cost, env_dtype=self.env_dtype,
                      mxu_dtype=self.mxu_dtype, svd_method=self.svd_method,
                      damp=(self.alpha != 1.0), monotone=self.monotone,
                      shift_report=shift, nl=self.nl)
        history: List[BondStats] = []
        for sw in range(sweeps.nsweep):
            maxm = int(sweeps.maxm[sw])
            minm = int(sweeps.minm[sw])
            cutoff = float(sweeps.cutoff[sw])
            if maxm > self.pad:
                raise ValueError(f"sweep {sw}: maxm {maxm} exceeds pad {self.pad}")
            if float(sweeps.noise[sw]) >= 1e-14:
                raise ValueError("fused sweeps do not support the noise term; "
                                 "use the per-bond engine (run)")
            self.set_hyper(cutoff, maxm, minm, noise=float(sweeps.noise[sw]))
            self.sweeps_done += 1
            swno = self.sweeps_done
            t0 = time.perf_counter()
            visit = []
            for forward in (True, False):
                visit += self._blocked_half(fb, forward, common)
            fetched = np.asarray(jnp.stack([v[2] for v in visit]))
            visit = [(b, d, row) for (b, d, _), row in zip(visit, fetched)]
            if shift:
                visit = self._shift_visit_metrics(
                    visit, final_fn=self._fused_final_metrics_blocked)
            dt = time.perf_counter() - t0
            for b, direction, vec in visit:
                st = self._unpack_stats(swno, b, direction,
                                        int(self.ranks[b + 1]), vec)
                self.ranks[b + 1] = st.newm
                history.append(st)
                if verbose == "bond":
                    self.print_bond_report(st)
            if verbose:
                last = history[-1]
                msg = (f"Sweep {swno} done in {dt:.2f}s "
                       f"(fused-blocked, {len(visit)} bonds, "
                       f"{dt / len(visit) * 1e3:.1f} ms/bond), "
                       f"max m = {int(self.ranks.max())}")
                if self.report_cost:
                    msg += (f", cost/NT {last.cost / self.nt:.10f}"
                            f", correct {last.ncorrect}/{self.nt}")
                    nwarn = sum(map(self.svd_regressed, history[-len(visit):]))
                    if nwarn:
                        msg += f", svd-regressed bonds {nwarn}"
                    nrej = sum(st.replaced for st in history[-len(visit):])
                    if nrej:
                        msg += f", rejected bonds {nrej}"
                print(msg)
        self._fused_dirty = "fixed"
        self._fs_state = "fixed"
        return history

    def _blocked_half(self, fb, forward: bool, common):
        """One half-sweep: A blocks | bond c-1 | bond c | B blocks (forward) or
        the mirror order.  While consuming its own boundaries (recorded by the
        opposite direction), each loop records its block-entry carries as the
        opposite direction's next boundaries.  Returns [(bond, dir, stats_row)]
        in visit order (stats rows are device arrays; fetched in bulk)."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment_blocked as segb
        from tnml_tpu.train.env import edge_env

        n, c = self.n, self.label_site
        d = 1 if forward else -1
        e_arr, e_sig = edge_env(self.nt, self.pad, self.dtype)
        e_arr, e_sig = self._shard(e_arr, 0), self._shard(e_sig, 0)
        car_a, car_s = e_arr.astype(jnp.float32), e_sig
        cur = fb["trav"]
        visit = []

        def seg(cur, car_a, car_s, b, t0, T):
            fb["cores_st"], cur, car_a, car_s, stats = segb.blocked_segment(
                fb["cores_st"], cur, car_a, car_s, b[0], b[1], fb["xs"],
                self.Y, self.labels, self._hyp_f, self._hyp_i, t0,
                T=T, forward=forward, **common)
            return cur, car_a, car_s, stats

        def center(wl, wr, na, ns, far, t, label_leg):
            return segb.center_step_far(
                wl, wr, na, ns, far[0], far[1],
                self.Xsites[t], self.Xsites[t + 1], self.Y, self.labels,
                self._hyp_f, self._hyp_i, label_leg=label_leg,
                forward=forward, **common)

        if forward:
            rec_A = []
            for j, (t0, T) in enumerate(fb["blocksA"]):
                rec_A.append(self._q_wing(car_a, car_s))
                cur, car_a, car_s, stats = seg(cur, car_a, car_s,
                                               fb["fwd_A"][j], t0, T)
                fb["fwd_A"][j] = None           # donated — drop the reference
                visit += [(t0 + i, d, stats[i]) for i in range(T)]
            fb["bwd_A"] = rec_A
            fb["bwd_c1"] = self._q_wing(car_a, car_s)
            nwl, nwr, env_a, env_s, st = center(
                cur, fb["label_core"], car_a, car_s, fb["fwd_c1"], c - 1,
                "right")
            fb["cores_st"] = fb["cores_st"].at[c - 1].set(nwl)
            visit.append((c - 1, d, st))
            fb["bwd_c"] = self._q_wing(env_a, env_s)
            nwl2, nwr2, env_a2, env_s2, st2 = center(
                nwr, fb["cores_st"][c + 1], env_a, env_s, fb["fwd_c"], c,
                "left")
            fb["label_core"] = nwl2
            visit.append((c, d, st2))
            cur, car_a, car_s = nwr2, env_a2, env_s2
            rec_B = []
            for j, (t0, T) in enumerate(fb["blocksB"]):
                rec_B.append(self._q_wing(car_a, car_s))
                cur, car_a, car_s, stats = seg(cur, car_a, car_s,
                                               fb["fwd_B"][j], t0, T)
                fb["fwd_B"][j] = None
                visit += [(t0 + i, d, stats[i]) for i in range(T)]
            fb["bwd_B"] = rec_B
        else:
            nB = len(fb["blocksB"])
            rec_B = [None] * nB
            for j in reversed(range(nB)):
                t0, T = fb["blocksB"][j]
                rec_B[j] = self._q_wing(car_a, car_s)
                cur, car_a, car_s, stats = seg(cur, car_a, car_s,
                                               fb["bwd_B"][j], t0, T)
                fb["bwd_B"][j] = None
                visit += [(t0 + T - 1 - i, d, stats[T - 1 - i])
                          for i in range(T)]
            fb["fwd_B"] = rec_B
            fb["fwd_c"] = self._q_wing(car_a, car_s)
            nwl, nwr, env_a, env_s, st = center(
                fb["label_core"], cur, car_a, car_s, fb["bwd_c"], c, "left")
            fb["cores_st"] = fb["cores_st"].at[c + 1].set(nwr)
            visit.append((c, d, st))
            fb["fwd_c1"] = self._q_wing(env_a, env_s)
            nwl2, nwr2, env_a2, env_s2, st2 = center(
                fb["cores_st"][c - 1], nwl, env_a, env_s, fb["bwd_c1"], c - 1,
                "right")
            fb["label_core"] = nwr2
            visit.append((c - 1, d, st2))
            cur, car_a, car_s = nwl2, env_a2, env_s2
            nA = len(fb["blocksA"])
            rec_A = [None] * nA
            for j in reversed(range(nA)):
                t0, T = fb["blocksA"][j]
                rec_A[j] = self._q_wing(car_a, car_s)
                cur, car_a, car_s, stats = seg(cur, car_a, car_s,
                                               fb["bwd_A"][j], t0, T)
                fb["bwd_A"][j] = None
                visit += [(t0 + T - 1 - i, d, stats[T - 1 - i])
                          for i in range(T)]
            fb["fwd_A"] = rec_A
        fb["trav"] = cur
        return visit

    def _fused_final_metrics_blocked(self):
        """Quadcost of the final blocked state at bond 0: the labelled right
        wing covering sites 2..N-1 is rebuilt from the first A-block boundary
        (recorded for the next forward half-sweep) over the current cores."""
        import jax.numpy as jnp
        from tnml_tpu.train import segment_blocked as segb

        fb = self._fsx
        t0, T = fb["blocksA"][0]
        b_arr, b_sig = fb["fwd_A"][0]
        arr, sig = b_arr.astype(jnp.float32), b_sig
        if T > 1:
            # boundary covers sites T+1..; extend down over sites T..2
            arr, sig = segb.extend_run(arr, sig, fb["cores_st"], fb["xs"],
                                       T, T=T - 1, fromleft=False)
        B5 = bond_ops.make_bond(fb["trav"], fb["cores_st"][1])
        e_arr, e_sig = self._edge_env()
        cost, pl, ncor, reg = jax.device_get(bond_ops.quadcost(
            B5, e_arr, e_sig, arr, sig, self.Xsites[0], self.Xsites[1],
            self.Y, self.labels, jnp.float32(self.lam), nl=self.nl))
        return (float(cost), np.asarray(pl, np.float32), float(ncor),
                float(reg))

    def _shift_ok(self) -> bool:
        """Whether shifted reporting (step.py shift_report) is valid: the
        incoming-metrics trick needs a plain CG method; combined with monotone
        acceptance it additionally needs the exact line-search cost identity
        (bond.monotone_accept_gated) — exact-recurrence CG, no damping."""
        if not self.report_cost or self.replace or self.noise >= 1e-14:
            return False
        if self.method not in ("conj", "fast_conj", "fast_conj_exact"):
            return False
        if self.monotone:
            # TNML_MONOTONE_GATE=0 forces the UNGATED acceptance (both
            # candidates measured by full quadcost passes) — diagnostic parity
            # with the round-4 runs; the gated form trusts the CG line-search
            # identity at clean bonds, which a numerics investigation may not
            # want to assume.
            if os.environ.get("TNML_MONOTONE_GATE", "1") == "0":
                return False
            return (self.method in ("conj", "fast_conj_exact")
                    and self.alpha == 1.0)
        return True

    def _reassert_precision(self) -> None:
        """Re-pin this engine's configured matmul precision at sweep entry.

        The global jax_default_matmul_precision is process-wide; another
        component constructed between sweeps (a second engine with a different
        setting, user code) may have rewritten it, silently flipping this
        engine's next trace/execution.  configure_matmul_precision is a no-op
        when the mode already matches, so this costs nothing in steady state.
        (Evaluators pin their own precision as a trace-local scope and never
        touch the global — utils/precision.py matmul_precision_scope.)"""
        from tnml_tpu.utils.precision import configure_matmul_precision
        configure_matmul_precision(self.precision)

    # -- extraction ---------------------------------------------------------------

    def _sync_fused(self) -> None:
        """Materialize self.cores from the fused device buffers on demand.

        run_fused keeps the model in stacked device buffers and only marks
        cores stale; the bulk fetch (180 MB at N=784/m=120 — ~2 s over a
        networked TPU tunnel) happens here, the first time something actually
        reads cores (checkpoint, evaluation, per-bond engine)."""
        kind = getattr(self, "_fused_dirty", None)
        if kind == "moving":
            self._fused_writeback()
        elif kind == "fixed":
            self._fused_writeback_fixed()
        self._fused_dirty = None

    def packed(self) -> PackedMPS:
        self._sync_fused()
        return PackedMPS(cores=list(self.cores), ranks=self.ranks.copy(),
                         label_site=self.label_site, pad=self.pad)
