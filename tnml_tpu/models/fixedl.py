"""fixedL: one multiclass MPS with a 10-dim label index fixed on the central core.

The flagship model family (reference: fixedL.cc).  The label index sits at core
``N//2`` (1-indexed site N/2, fixedL.cc:616) and never moves.  Initialization follows
the reference's three paths (fixedL.cc:669-728):

a) warm restart from a saved ``W`` checkpoint,
b) merge of ten one-vs-rest MPS ``W0..W9`` (from `single` or `linear`), each tensored
   with its label basis vector and summed,
c) cold start: per label, sum ``ninitial`` random same-label training product states,
   scale by 0.1, attach the label vector, then sum across labels and normalize the
   center core.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.ops import mps_sum, product_state
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps


def center_site(n: int) -> int:
    """0-indexed center: the reference's 1-indexed site N/2 (fixedL.cc:616)."""
    return n // 2 - 1


def _sweep_annotation(profile_dir, sw: int):
    """Profiler step annotation per sweep; no-op when not profiling."""
    if not profile_dir:
        import contextlib
        return contextlib.nullcontext()
    import jax.profiler as _prof
    return _prof.StepTraceAnnotation("sweep", step_num=sw)


def cold_start(X: np.ndarray, labels: np.ndarray, *, ninitial: int = 100,
               n_labels: int = 10, seed: int = 0, verbose: bool = True) -> MPS:
    """Init path (c): sums of random same-label product states (fixedL.cc:703-728)."""
    from tnml_tpu.utils.sampling import rand_imgs

    n = X.shape[1]
    c = center_site(n)
    rng = np.random.default_rng(seed)
    ipsis: List[MPS] = []
    for l in range(n_labels):
        # randImg rejection-sampling parity (util.h:104-121): uniform draws over
        # the whole set rejected until the label matches; repeats possible
        pick = rand_imgs(rng, labels, l, ninitial)
        if verbose:
            print(f"Summing {len(pick)} random label {l} states")
        psis = [product_state(X[i]) for i in pick]
        s = mps_sum(psis, cutoff=1e-10, maxm=10)
        s.scale(0.1, site=c)
        s.attach_label(c, l, n_labels)
        ipsis.append(s)
    if verbose:
        print(f"Summing all {len(ipsis)} label states together")
    w = mps_sum(ipsis, cutoff=1e-8, maxm=10)
    w.cores[c] = w.cores[c] / np.linalg.norm(w.cores[c])
    return w


def merge_one_vs_rest(ws: Sequence[MPS], *, cutoff: float = 1e-10,
                      maxm: int = 2**30, n_labels: int = 10) -> MPS:
    """Init path (b): attach label vectors to W0..W9 and sum (fixedL.cc:682-701)."""
    if len(ws) != n_labels:
        raise ValueError(f"expected {n_labels} MPS, got {len(ws)}")
    n = ws[0].n
    c = center_site(n)
    terms = []
    for l, w in enumerate(ws):
        t = w.copy()
        if t.label_site is not None:
            raise ValueError(f"W{l} already carries a label index")
        t.attach_label(c, l, n_labels)
        terms.append(t)
    return mps_sum(terms, cutoff=cutoff, maxm=maxm)


@dataclass
class FixedLConfig:
    nsweep: int = 50
    maxm: int = 5000
    minm: Optional[int] = None        # reference default: max(10, maxm//2)
    cutoff: float = 1e-10
    lam: float = 0.0
    alpha: float = 1.0   # bond-update damping B <- (1-a)B0 + a*Bcg (the reference's
                         # reserved `alpha` input, README.md:76, realized)
    npass: int = 4
    cconv: float = 1e-10
    method: str = "conj"
    ninitial: int = 100
    replace: bool = False      # reference's experimental revert-on-worse (README.md:76)
    monotone: bool = False     # reject-on-regress bond acceptance (every layout):
                               # per-bond cost becomes non-increasing — kills the
                               # CG-overshoot oscillation at full scale
                               # (train/bond.py::monotone_accept)
    report_cost: bool = True
    pad: Optional[int] = None         # padded bond dim; default grows on demand
    label_mode: str = "fixed"         # 'fixed' (reference) | 'moving' (paper; all
                                      # wings label-free -> 10x less env memory)
    maxm_schedule: Optional[List[int]] = None   # per-sweep maxm ramp (then hold)
    keep_best: bool = False    # keep the best per-sweep checkpoint instead of the
                               # last one: best held-out accuracy when a test set is
                               # provided (dotest), else lowest training cost
    dotest: bool = False       # evaluate the held-out set after every sweep
                               # (in-training fulltest, `dotest` input parameter)
    env_dtype: Optional[str] = None   # 'bf16' stores wings in bfloat16 (the full
                                      # 58,862-image set needs this on 16 GB HBM)
    mxu_dtype: Optional[str] = None   # 'bf16' feeds MXU matmuls in bfloat16
    svd_method: str = "ritz"   # bond split: 'ritz' (default since round 5 —
                               # quality-identical to gram on the moving tuned
                               # config AND the fixed anchor at high, with a
                               # better cost trajectory and -1.9% s/sweep,
                               # .bench/quality_fixn_ritz_r5.log) | 'gram' |
                               # 'qr' (backward-stable) | 'svd' (LAPACK parity)
    precision: Optional[str] = None   # matmul precision.  None resolves per
                                      # layout (resolved_precision): 'high'
                                      # (bf16_3x) for the fixed-label regime —
                                      # quality-validated at full scale since the
                                      # round-4 iso-aware split fix (100.00% on
                                      # both the anchor and the 58,862-image
                                      # flagship, .bench/q_fullset_high_r4.log)
                                      # and 1.14x faster — 'highest' (true f32)
                                      # otherwise; 'default' trades more mantissa
                                      # for MXU speed (engine.py)
    profile_dir: Optional[str] = None  # write a jax.profiler trace (xprof/
                                       # tensorboard format) covering the sweeps
    pause_step: bool = False   # interactive per-bond gate (the reference's
                               # pause_step PAUSE macro, fixedL.cc:561,597)

    @staticmethod
    def _dtype(name):
        if name is None:
            return None
        import jax.numpy as _jnp
        m = {"bf16": _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
             "f32": _jnp.float32, "float32": _jnp.float32}
        if name not in m:
            raise ValueError(f"dtype {name!r} not recognized (bf16|f32)")
        return m[name]

    def resolved_minm(self) -> int:
        return self.minm if self.minm is not None else max(10, self.maxm // 2)

    def resolved_precision(self) -> str:
        """Layout-aware matmul-precision default (round-5 flip, VERDICT r4).

        The fixed-label regime's requirement used to be 'highest' (true f32);
        since the round-4 iso-aware split fix, 'high' (bf16_3x) is
        quality-validated at FULL scale for it — 100.00% held-out on both the
        740/label anchor (.bench/quality_fixn_high_r4.log) and the
        58,862-image flagship (.bench/q_fullset_high_r4.log, 1-5 monotone
        rejections/sweep) — and measures 1.14x faster (14.86 vs 16.88 s/sweep,
        .bench/r4_perf2.log).  The moving-label mode keeps 'highest' as its
        implicit-precision default: its headline perf path opts into
        'default' explicitly (bench.py), which is the setting its quality was
        measured under."""
        if self.precision is not None:
            return self.precision
        return "high" if self.label_mode == "fixed" else "highest"

    def maxm_for_sweep(self, sw: int) -> int:
        if not self.maxm_schedule:
            return self.maxm
        sched = self.maxm_schedule
        return int(sched[min(sw, len(sched) - 1)])


class FixedLModel:
    """Train/evaluate wrapper around the sweep engine for the fixedL family."""

    def __init__(self, w: MPS):
        if w.label_site is None:
            raise ValueError("fixedL model needs a labeled MPS")
        self.w = w

    # -- constructors --------------------------------------------------------

    @classmethod
    def initialize(cls, X: np.ndarray, labels: np.ndarray, cfg: FixedLConfig,
                   workdir: str = ".", verbose: bool = True) -> "FixedLModel":
        """The reference's three-way init dispatch (fixedL.cc:669-728)."""
        wpath = os.path.join(workdir, "W")
        w0path = os.path.join(workdir, "W0")
        if os.path.exists(wpath):
            if verbose:
                print("Reading W from disk")
            return cls(ckpt.load_mps(wpath))
        if os.path.exists(w0path):
            if verbose:
                print("Found separate W0,W1,...,W9 MPS: summing")
            ws = [ckpt.load_mps(os.path.join(workdir, f"W{l}")) for l in range(10)]
            # the reference sums under the run's Cutoff/Maxm (fixedL.cc:697);
            # without the cap, ten m=64 parents direct-sum to m=640 and the
            # engine pad would balloon past the configured maxm
            w = merge_one_vs_rest(ws, cutoff=cfg.cutoff, maxm=cfg.maxm)
            ckpt.save_mps(wpath, w)
            return cls(w)
        w = cold_start(X, labels, ninitial=cfg.ninitial, verbose=verbose)
        ckpt.save_mps(wpath, w)
        return cls(w)

    # -- training --------------------------------------------------------------

    def make_engine(self, X: np.ndarray, labels: np.ndarray, cfg: FixedLConfig,
                    sharding=None, pad: Optional[int] = None,
                    env_store=None) -> SweepEngine:
        if cfg.label_mode == "moving" and self.w.label_site not in (0, 1):
            # transporting the label grows bonds by up to d per site; cap at maxm
            self.w.move_label(0, cutoff=1e-12, maxm=cfg.maxm)
        if pad is None:
            # XLA needs static shapes: start with a small pad and regrow on demand
            # (SURVEY.md §7 "Dynamic bond dimensions vs XLA static shapes")
            pad = cfg.pad or min(cfg.maxm, max(16, 2 * self.w.max_bond()))
        pad = max(pad, self.w.max_bond())
        eng = SweepEngine(pack(self.w, pad), X, labels,
                           lam=cfg.lam, alpha=cfg.alpha,
                           npass=cfg.npass, cconv=cfg.cconv,
                           method=cfg.method, report_cost=cfg.report_cost,
                           replace=cfg.replace, monotone=cfg.monotone,
                           env_dtype=cfg._dtype(cfg.env_dtype),
                           mxu_dtype=cfg._dtype(cfg.mxu_dtype),
                           svd_method=cfg.svd_method,
                           precision=cfg.resolved_precision(),
                           label_mode=cfg.label_mode, env_store=env_store,
                           sharding=sharding)
        # the adaptive pad will regrow to cfg.maxm; variant choices size at the
        # final pad so the engine's auto routing agrees with _use_fused
        eng.sizing_pad = max(pad, cfg.maxm or pad)
        return eng

    def _use_fused(self, eng, cfg: FixedLConfig, verbose=False) -> bool:
        """Scan-fused sweeps whenever the method allows it.  The fixed-label
        layout's far-wing buffer is 10x wider than the moving mode's; when it
        would not fit the device wing budget (train/memmodel.py — the single
        sizing model, TNML_FUSED_FIXED_MAX_BYTES overrides) the sqrt-memory
        blocked engine (train/segment_blocked.py) takes over, and only if even
        its boundary rows would not fit does the run fall back to the per-bond
        engine (with its offload-capable env table).
        """
        from tnml_tpu.train import memmodel
        if cfg.method not in ("conj", "fast_conj", "fast_conj_exact"):
            return False
        if cfg.label_mode == "moving":
            return True
        if not eng._fused_supported():
            return False
        c, n = eng.label_site, eng.n
        itemsize = 2 if cfg.env_dtype in ("bf16", "bfloat16") else 4
        chips = memmodel.shard_count(eng.sharding)
        # size at the run's FINAL pad (cfg.maxm), not the adaptive current pad:
        # a ramped run that will end blocked should start blocked instead of
        # burning resident compiles it must abandon (and the resident pick at a
        # small pad can OOM anyway — the transient-double, memmodel docstring)
        size_pad = max(eng.pad, cfg.maxm or eng.pad)
        sz = memmodel.fixed_layout_bytes(-(-eng.nt // chips), size_pad,
                                         eng.model.n_labels or 10, c, n,
                                         itemsize)
        limit = memmodel.fused_budget_bytes()
        if sz["total"] > limit:
            eng.blocked_K = eng.blocked_K or \
                int(os.environ.get("TNML_BLOCKED_K", 0)) or None
            K = eng.blocked_K or eng._pick_block(sz["rows"])
            need_blocked = memmodel.blocked_layout_bytes(sz["rows"],
                                                         sz["row_bytes"], K)
            if need_blocked < memmodel.blocked_budget_bytes():
                if verbose:
                    print(f"[fused] labeled wing stack would need "
                          f"{sz['labelled'] / 1e9:.1f} GB/chip; using the "
                          f"blocked engine (K={K}, "
                          f"~{need_blocked / 1e9:.1f} GB)")
                eng.fused_variant = "blocked"
                return True
            if verbose:
                # report the budget the blocked comparison actually used (the
                # resident `limit` is tighter and printing it here misleads
                # capacity debugging — round-4 advisor finding)
                print(f"[fused] labeled wing boundary rows would need "
                      f"{need_blocked / 1e9:.1f} GB/chip "
                      f"(> {memmodel.blocked_budget_bytes() / 1e9:.1f} GB "
                      f"blocked budget; resident budget {limit / 1e9:.1f} GB); "
                      "using the per-bond engine")
            return False
        return True

    def train(self, X: np.ndarray, labels: np.ndarray, cfg: FixedLConfig,
              workdir: Optional[str] = ".", sharding=None, verbose: bool = True,
              per_sweep_hook=None, env_store=None, test_data=None):
        """Full mldmrg run with per-sweep checkpointing and control-file polling.

        ``test_data=(X_test, labels_test)`` enables per-sweep held-out evaluation
        (the in-training fulltest, `dotest`); with ``keep_best`` the checkpoint
        with the best test accuracy is kept instead of the lowest-training-cost one.
        """
        evaluator = None
        if test_data is not None:
            from tnml_tpu.eval.fulltest import Evaluator
            evaluator = Evaluator(test_data[0], test_data[1])
        eng = self.make_engine(X, labels, cfg, sharding=sharding,
                               env_store=env_store)
        # CG training runs scan-fused; the fixed-label layout additionally needs
        # its 10x-wide labeled wing buffer to fit HBM (see _use_fused).  The
        # interactive pause gate is per-bond, so it forces the per-bond path.
        fused = self._use_fused(eng, cfg, verbose) and not cfg.pause_step
        if fused and env_store is not None and hasattr(env_store, "device_resident"):
            # out-of-core was requested (Nbatch>1/offload) but the fused engine
            # keeps its wings in internal scan buffers — the store would sit
            # inert.  Fail loudly into the per-bond engine, which honors it.
            print("[offload] out-of-core wing store requested: using the "
                  "per-bond engine (the scan-fused path keeps wings in fused "
                  "device buffers; set offload = none to run fused)")
            fused = False
        if not fused:
            eng.init_envs()
            if verbose:
                cost, _, ncor, _ = eng.quadcost(0)
                print(f"Before starting DMRG Cost = {float(cost) / eng.nt:.10f} "
                      f"(correct {int(ncor)}/{eng.nt})")
        elif verbose:
            cost, ncor = eng.initial_report()
            print(f"Before starting DMRG Cost = {cost / eng.nt:.10f} "
                  f"(correct {ncor}/{eng.nt})")
        history = []
        stop = [False]

        def control_hook(b, direction):
            """Per-bond control-file polling (fixedL.cc:542-559)."""
            if cfg.pause_step:
                # the reference's interactive PAUSE gate (fixedL.cc:561): wait for
                # Enter after each bond step is enqueued
                input(f"PAUSE at bond {b + 1} (Enter to continue) ")
            if workdir is None:
                return
            ctl = ckpt.poll_control_files(workdir)
            if ctl.get("write_wf"):
                print("File WRITE_WF found\nWriting W to disk")
                ckpt.save_mps(os.path.join(workdir, "W"), unpack(eng.packed()))
            if "lambda" in ctl:
                print(f"new lambda = {ctl['lambda']}")
                eng.set_lambda(ctl["lambda"])
            if ctl.get("stop"):
                stop[0] = True

        # flag-gated jax.profiler trace (SURVEY.md §5 tracing row): one xprof
        # artifact covering all sweeps, each annotated as a profiler "step"
        import contextlib
        prof_ctx = contextlib.nullcontext()
        if cfg.profile_dir:
            import jax.profiler as _prof
            prof_ctx = _prof.trace(cfg.profile_dir)
            if verbose:
                print(f"[profile] writing jax.profiler trace to {cfg.profile_dir}")
        # fused mode polls control files per sweep instead of per bond
        best_cost, best_acc, best_w = float("inf"), -1.0, None
        with prof_ctx:
          for sw in range(cfg.nsweep):
            t0 = time.perf_counter()
            with _sweep_annotation(cfg.profile_dir, sw):
                maxm_sw = min(cfg.maxm_for_sweep(sw), eng.pad)
                sweeps1 = Sweeps.constant(1, min(cfg.resolved_minm(), maxm_sw),
                                          maxm_sw, cfg.cutoff)
                if fused:
                    history += eng.run_fused(sweeps1, verbose=verbose)
                    control_hook(0, +1)
                else:
                    history += eng.run(sweeps1, per_bond_hook=control_hook,
                                       verbose=verbose)
            t1 = time.perf_counter()
            self.w = unpack(eng.packed())
            t2 = time.perf_counter()
            if evaluator is not None:
                rep = evaluator.evaluate_engine(eng)
                if verbose:
                    print(f"Sweep {sw + 1} test accuracy = "
                          f"{rep.accuracy * 100.0:.2f}% "
                          f"({rep.n_correct}/{rep.n_total})")
                if cfg.keep_best and rep.accuracy > best_acc:
                    best_acc, best_w = rep.accuracy, self.w
            elif cfg.keep_best and history and history[-1].cost == history[-1].cost:
                if history[-1].cost < best_cost:
                    best_cost, best_w = history[-1].cost, self.w
            t3 = time.perf_counter()
            if workdir is not None:
                ckpt.save_mps(os.path.join(workdir, "W"), self.w)
            t4 = time.perf_counter()
            if verbose:
                # per-sweep app-path attribution (VERDICT r4 item 7): train is
                # the engine core; fetch = device->host core-stack unpack;
                # eval = held-out fulltest (dotest only); ckpt = W write
                print(f"[sweep-timing] train={t1 - t0:.2f}s "
                      f"fetch={t2 - t1:.2f}s eval={t3 - t2:.2f}s "
                      f"ckpt={t4 - t3:.2f}s")
            if per_sweep_hook is not None:
                per_sweep_hook(sw, eng, history)
            if stop[0]:
                print("Found file STOP, exiting")
                break
            # adaptive pad growth: regrow + recompile only when ranks hit the pad
            if int(eng.ranks.max()) >= eng.pad and eng.pad < cfg.maxm:
                new_pad = min(cfg.maxm, eng.pad * 2)
                if verbose:
                    print(f"[pad] bond ranks reached {eng.pad}; repacking to {new_pad}")
                # forward the env store (cleared: its wings have the old pad) so an
                # out-of-core run stays out-of-core after the repack
                if env_store is not None:
                    env_store.clear()
                eng = self.make_engine(X, labels, cfg, sharding=sharding,
                                       pad=new_pad, env_store=env_store)
                fused = self._use_fused(eng, cfg, verbose)  # pad grew: re-check
                if not fused:
                    eng.init_envs()
        if cfg.keep_best and best_w is not None:
            if verbose:
                what = (f"test accuracy {best_acc * 100.0:.2f}%"
                        if evaluator is not None else
                        f"cost/NT {best_cost / eng.nt:.10f}")
                print(f"[keep_best] restoring sweep checkpoint with {what}")
            self.w = best_w
            if workdir is not None:
                ckpt.save_mps(os.path.join(workdir, "W"), self.w)
        return history

    # -- inference ---------------------------------------------------------------

    def predict(self, X: np.ndarray) -> np.ndarray:
        from tnml_tpu.eval.fulltest import full_test
        rep = full_test(self.w, X, np.zeros(X.shape[0], dtype=np.int64))
        return rep.predictions

    def save(self, path: str) -> None:
        ckpt.save_mps(path, self.w)

    @classmethod
    def load(cls, path: str) -> "FixedLModel":
        return cls(ckpt.load_mps(path))
