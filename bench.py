#!/usr/bin/env python
"""Headline benchmark: fixedL-family sweep wall-clock at m=120 on one TPU chip.

Default configuration is the moving-label (paper-style) variant on the scan-fused
engine — the best-performing mode; set TNML_BENCH_LABEL_MODE=fixed for the
reference's fixed-label layout (auto-routed to the sqrt-memory blocked engine
at full-set batch sizes, train/segment_blocked.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  Robustness
(round-3 post-mortem — BENCH_r03 recorded nothing): a provisional copy of the
line is printed after EVERY measured sweep (the last line on stdout is always
the best current measurement), and a watchdog thread converts any hang (wedged
device claim, compile stall) into a parseable diagnostic line + nonzero exit
instead of an rc=124 with empty stdout.  Stage budgets are env-tunable:
TNML_BENCH_DEVICE_BUDGET (600 s), TNML_BENCH_COLD_BUDGET (600 s),
TNML_BENCH_COMPILE_BUDGET (1200 s), TNML_BENCH_SWEEP_BUDGET (600 s).

Config (BASELINE.md "fixedL full" anchor, scaled by TNML_BENCH_B): N=784 sites,
feature='series' with the reference's double-/255 normalization, fixed label index at
the central core, maxm=120, Npass=4 CG passes, lambda=1e-3, per-bond post-SVD cost
reporting on (the reference's mldmrg does it every bond, fixedL.cc:532).

Timing: sweep 1 warms compilation and rank growth; the reported value is the mean of
the next TNML_BENCH_SWEEPS (default 2) full sweeps (2*(N-1)=1566 bond steps each).
Padded static shapes make sweep time rank-independent, so this is steady-state.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the baseline is an
analytic estimate of the reference binary on the same config:
  flops/bond ~ (2*Npass + 1) gradient-shaped data passes * 2 contractions
               * 2 * NT * m^2 * d^2 * L   (f64)
at an assumed 50 GFLOP/s aggregate for 16 pthreads (paralleldo.h caps at 16;
setOneThread pins BLAS to 1 thread, so per-thread small-tensor contractions at
~3 GFLOP/s f64 is generous).  vs_baseline = est_ref_seconds / measured_seconds;
> 1 means this framework is faster.

**Both flagship layouts land in ONE parsed line** (round-5, VERDICT r4 item 1):
after the moving-label headline, the same process measures the REFERENCE-FAITHFUL
fixed-label flagship (label pinned to the central core, fixedL.cc:616 — the only
layout the reference actually has; its moving-label helper is dormant code,
util.h:202-244) on the sqrt-memory blocked engine, and merges
``flagship_fixed_s_per_sweep`` / ``_tflops`` / ``_vs_baseline`` / ``_precision``
into the final JSON.  The moving headline stays the ``value`` field.  Disable the
extra stage with TNML_BENCH_FIXED=0; it is skipped automatically when
TNML_BENCH_LABEL_MODE=fixed already makes the MAIN measurement the fixed layout.

Env overrides: TNML_BENCH_B (60000), TNML_BENCH_MAXM (120), TNML_BENCH_NPASS (4),
TNML_BENCH_SWEEPS (2), TNML_BENCH_ENV_DTYPE (bf16|f32), TNML_BENCH_LABEL_MODE
(fixed|moving), TNML_BENCH_METHOD (fast_conj_exact|conj|fast_conj), TNML_BENCH_N
(784 -> 28x28 images), TNML_BENCH_PRECISION (default|high|highest),
TNML_BENCH_FIXED (1), TNML_BENCH_FIXED_PRECISION (high — the quality-validated
fixed-regime default since round 4), TNML_BENCH_FIXED_SWEEPS (2).

Precision: the engine's correctness default is 'highest' (true f32,
utils/precision.py); since the round-4 iso-aware split fix, 'high' (bf16_3x) is
quality-validated for the fixed regime too (100.00% anchor, docs/DESIGN.md) and
1.14x faster.  The moving-label headline runs 'default' (single-pass bf16
operands, f32 accumulation), the setting under which its full-set quality
(87%+ test acc) was measured.  Explicit
``mxu_dtype=bf16`` measured 12x SLOWER than f32 at these shapes (bf16 tiling of the
tiny-minor-dim wing products) — precision, not operand dtype, is the speed knob here.

The JSON line also reports ``tflops_sustained``: achieved FLOP/s from the actual
einsum schedule of the fused bond step ((npass+1) CG data passes of apply+outer,
two matmuls of 2*B*(m*d)*(m*d*L) flops = 4*B*(m*d)^2*L per pass; the per-bond
post-SVD cost report is free via shifted reporting, step.py).  The number is
cap-checked against the detected chip's bf16 peak — exceeding it fails the run.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# ---------------------------------------------------------------------------
# Watchdog (round-3 post-mortem: BENCH_r03.json recorded rc=124/parsed=null
# because the process hung at or before first device use — a wedged TPU pool
# claim gives jax.devices() no timeout of its own).  A daemon thread tracks
# the current stage and its budget; on breach it prints a parseable JSON line
# (the provisional result if one exists, else {"error": ...}) and hard-exits,
# so the driver's `timeout` never reaps a silent process.
# ---------------------------------------------------------------------------
_WD = {"stage": "startup", "t0": time.time(), "budget": 120.0, "best": None}
_WD_LOCK = threading.Lock()


def _stage(name: str, budget_s: float) -> None:
    with _WD_LOCK:
        _WD["stage"] = name
        _WD["t0"] = time.time()
        _WD["budget"] = budget_s
    print(f"[bench] stage: {name} (budget {budget_s:.0f}s)", file=sys.stderr)


def _provisional(result: dict) -> None:
    """Record + print a parseable result line NOW; a later timeout/watchdog
    still leaves this line on stdout (the final line overwrites it)."""
    with _WD_LOCK:
        _WD["best"] = result
    print(json.dumps(result), flush=True)


def _watchdog() -> None:
    while True:
        time.sleep(5.0)
        with _WD_LOCK:
            stage, t0, budget, best = (_WD["stage"], _WD["t0"],
                                       _WD["budget"], _WD["best"])
        if time.time() - t0 <= budget:
            continue
        if best is not None:
            # a provisional result was already printed; reprint as the last
            # line and exit 0 — the measurement is real, only extras timed out
            print(f"[bench] watchdog: stage {stage!r} exceeded {budget:.0f}s "
                  "after a measured sweep; emitting provisional result",
                  file=sys.stderr)
            print(json.dumps(best), flush=True)
            os._exit(0)
        print(json.dumps({
            "error": f"watchdog: stage {stage!r} exceeded {budget:.0f}s "
                     "with no measured sweep (wedged device claim or compile "
                     "stall — see BENCH_r03 post-mortem)",
            "metric": "fixedL sweep wall-clock", "value": None,
            "unit": "s/sweep", "vs_baseline": None,
        }), flush=True)
        os._exit(3)


def main() -> int:
    B = int(os.environ.get("TNML_BENCH_B", 60000))
    maxm = int(os.environ.get("TNML_BENCH_MAXM", 120))
    npass = int(os.environ.get("TNML_BENCH_NPASS", 4))
    nsweeps = int(os.environ.get("TNML_BENCH_SWEEPS", 2))
    env_dtype_s = os.environ.get("TNML_BENCH_ENV_DTYPE", "bf16")
    label_mode = os.environ.get("TNML_BENCH_LABEL_MODE", "moving")
    method = os.environ.get("TNML_BENCH_METHOD", "fast_conj_exact")
    # fixed-regime precision default is 'high' since the round-4 iso-aware
    # split fix quality-validated it at full scale (models/fixedl.py
    # resolved_precision)
    precision = os.environ.get("TNML_BENCH_PRECISION",
                               "default" if label_mode == "moving" else "high")
    n_sites = int(os.environ.get("TNML_BENCH_N", 784))
    size = int(round(n_sites ** 0.5))

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    # honor an explicit JAX_PLATFORMS env var: the axon sitecustomize's
    # register() overrides the config to "axon,cpu" at interpreter start, so
    # JAX_PLATFORMS=cpu in the environment would otherwise be silently ignored
    # (and a CPU smoke run would wedge on the TPU pool claim)
    from tnml_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    from tnml_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tnml_tpu.data.mnist import TRAIN, read_mnist
    from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel, cold_start
    from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
    from tnml_tpu.train.schedule import Sweeps

    # device acquisition is the round-3 hang site: a wedged pool claim blocks
    # here indefinitely (memory: killed axon jobs can wedge the claim for
    # hours) — fail with a diagnostic line instead
    _stage("device acquisition", float(os.environ.get(
        "TNML_BENCH_DEVICE_BUDGET", 600)))
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    _stage("data load + featurize", 300.0)
    ds = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=max(1, B // 10),
                    size=size, verbose=False)
    X = featurize(ds.images, FEATURE_SERIES, d=2)
    labels = ds.labels
    print(f"[bench] {X.shape[0]} images, {X.shape[1]} sites, maxm={maxm}, "
          f"npass={npass}, env_dtype={env_dtype_s}, label_mode={label_mode}",
          file=sys.stderr)

    try:
        env_dtype = {"bf16": jnp.bfloat16, "f32": None}[env_dtype_s]
    except KeyError:
        raise SystemExit(f"TNML_BENCH_ENV_DTYPE={env_dtype_s!r} not recognized "
                         "(bf16|f32)")

    # analytic reference estimate (see module docstring)
    d, L, NT, N = 2, 10, X.shape[0], X.shape[1]
    passes = 2 * npass + 1
    flops_per_bond = passes * 2 * 2 * NT * (maxm ** 2) * (d ** 2) * L
    ref_flops = 2 * (N - 1) * flops_per_bond
    ref_seconds = ref_flops / 50e9
    # achieved FLOP/s of OUR schedule: (npass+1) data passes per bond, each an
    # apply (Lphi[B,md] @ Bmat[md,md*L]) plus an outer-gradient (Lphi^T @ U) —
    # TWO matmuls of 2*B*(m*d)*(m*d*L) flops each, so 4*B*(md)^2*L per pass
    # (the P-reduction and U-build between them are elementwise, train/bond.py:79-89).
    # The per-bond post-SVD cost report is FREE (shifted reporting: the next
    # bond's CG gradient pass measures it by gauge invariance — train/step.py
    # shift_report), so it adds no flops.
    md = maxm * d
    our_per_bond = (npass + 1) * 4 * NT * md * md * L
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0,
             "v6e": 918.0, "cpu": 10.0}
    peak = next((v for k, v in peaks.items() if k in kind), None)

    def sweep_tflops(secs: float):
        """Achieved logical FLOP/s; None (FAIL) when it exceeds the chip peak."""
        tflops = our_per_bond * 2 * (N - 1) / secs / 1e12
        if peak is not None and tflops > peak:
            print(f"[bench] ERROR: computed {tflops:.1f} TF/s exceeds the "
                  f"{kind} bf16 peak {peak} TF/s — FLOP accounting is wrong",
                  file=sys.stderr)
            return None
        return tflops

    def make_result(secs: float, n_measured: int):
        tflops = sweep_tflops(secs)
        if tflops is None:
            return None
        out = {
            "metric": f"fixedL sweep wall-clock (B={NT}, N={N}, maxm={maxm}, "
                      f"npass={npass}, {method}, {label_mode} label, "
                      f"env={env_dtype_s}, prec={precision})",
            "value": round(secs, 3),
            "unit": "s/sweep",
            "vs_baseline": round(ref_seconds / secs, 2),
            "tflops_sustained": round(tflops, 1),
            "n_measured_sweeps": n_measured,
        }
        # MEASURED CPU anchor (VERDICT r2 item 5): .bench/cpu_baseline.py times
        # the engine's own fused_bond_step on the JAX CPU backend at the
        # headline shapes; vs_cpu scales its single-core per-bond time by the
        # reference's 16-thread cap (perfect scaling — generous to the
        # reference) and by the batch ratio (per-bond work is linear in B),
        # then compares full sweeps.
        cpu_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".bench", "cpu_baseline.json")
        if os.path.exists(cpu_path):
            with open(cpu_path) as f:
                cpu = json.load(f)
            per_bond = cpu.get(f"per_bond_s_1core_{label_mode}")
            if per_bond and cpu.get("config", {}).get("maxm") == maxm and \
                    cpu["config"].get("npass") == npass:
                scale = (NT / cpu["config"]["B"]) / 16.0
                cpu_sweep = per_bond * scale * 2 * (N - 1)
                out["vs_cpu_measured_16t"] = round(cpu_sweep / secs, 2)
                out["cpu_1core_bond_s"] = per_bond
        return out

    sweeps1 = Sweeps.constant(1, min(10, maxm), maxm, 1e-10)
    cold_budget = float(os.environ.get("TNML_BENCH_COLD_BUDGET", 600))
    compile_budget = float(os.environ.get("TNML_BENCH_COMPILE_BUDGET", 1200))
    sweep_budget = float(os.environ.get("TNML_BENCH_SWEEP_BUDGET", 600))

    def measure_mode(mode: str, prec: str, svd: str, n_measured: int,
                     tag: str, on_sweep):
        """Cold-start, compile, and measure one flagship layout; calls
        ``on_sweep(times, hist, eng)`` after every measured sweep so a partial
        result is always emitted before a potential watchdog breach."""
        cfg = FixedLConfig(nsweep=1, maxm=maxm, cutoff=1e-10, lam=1e-3,
                           npass=npass, ninitial=10, pad=maxm, label_mode=mode,
                           method=method, precision=prec, svd_method=svd)
        _stage(f"{tag}cold start", cold_budget)
        t0 = time.time()
        w = cold_start(X, labels, ninitial=cfg.ninitial, verbose=False)
        model = FixedLModel(w)
        print(f"[bench] {tag}cold start: {time.time() - t0:.1f}s, "
              f"init bond {w.max_bond()}", file=sys.stderr)
        eng = model.make_engine(X, labels, cfg, pad=maxm)
        eng.env_dtype = env_dtype
        # both layouts run scan-fused (segment.py / segment_fixed.py); the
        # fixed layout's labelled wing stack is 10x wider, so beyond ~10-12k
        # images on one chip run_fused auto-routes to the sqrt-memory blocked
        # engine (segment_blocked.py) — the full set runs single-chip there
        run = eng.run_fused
        # warm compile: ~460 s on a cold persistent cache (BENCH_r02 tail)
        _stage(f"{tag}warm sweep (compile)", compile_budget)
        t0 = time.time()
        run(sweeps1, verbose=False)
        print(f"[bench] {tag}warm sweep (compile): {time.time() - t0:.1f}s",
              file=sys.stderr)
        times = []
        for i in range(n_measured):
            _stage(f"{tag}measured sweep {i + 1}/{n_measured}", sweep_budget)
            t0 = time.time()
            hist = run(sweeps1, verbose=False)
            times.append(time.time() - t0)
            print(f"[bench] {tag}sweep {i + 2}: {times[-1]:.2f}s "
                  f"cost/NT={hist[-1].cost / eng.nt:.6f} "
                  f"correct={hist[-1].ncorrect}/{eng.nt} "
                  f"maxrank={int(eng.ranks.max())}", file=sys.stderr)
            if on_sweep(times, hist, eng) is None:
                return None
        return times

    def on_main_sweep(times, hist, eng):
        # one measured sweep = a real number; make it survivable immediately
        prov = make_result(float(np.mean(times)), len(times))
        if prov is not None:
            _provisional(prov)
        return prov

    # ritz split for BOTH layouts since round 5: quality-identical to gram on
    # the moving tuned config (.bench/quality_mv_{gram,ritz}_r3.log) AND on the
    # fixed anchor at precision=high (100.00% from sweep 3, BETTER cost
    # trajectory 0.0172 vs 0.0234 at sweep 11, chain maxjump 4e-07 vs 2e-05 —
    # .bench/quality_fixn_ritz_r5.log vs quality_fixn_high_r4.log), and
    # -1.9% s/sweep on the fixed flagship (.bench/r5_fixed_ritz.log)
    times = measure_mode(label_mode, precision,
                         svd=os.environ.get("TNML_BENCH_SVD", "ritz"),
                         n_measured=nsweeps, tag="", on_sweep=on_main_sweep)
    if times is None:
        return 1
    out = make_result(float(np.mean(times)), len(times))
    if out is None:
        return 1

    # ---- reference-faithful fixed-label flagship (VERDICT r4 item 1) -------
    # the reference's ONLY layout pins the label to the central core
    # (fixedL.cc:616); measure it in the same artifact so the apples-to-apples
    # headline is driver-captured, not builder-log-only.
    want_fixed = (os.environ.get("TNML_BENCH_FIXED", "1") == "1"
                  and label_mode == "moving")
    if want_fixed:
        import gc
        fixed_prec = os.environ.get("TNML_BENCH_FIXED_PRECISION", "high")
        fixed_sweeps = int(os.environ.get("TNML_BENCH_FIXED_SWEEPS", 2))
        gc.collect()   # drop the moving engine's ~11 GB wing stacks first

        def on_fixed_sweep(times, hist, eng):
            secs = float(np.mean(times))
            tflops = sweep_tflops(secs)
            out["flagship_fixed_s_per_sweep"] = round(secs, 3)
            out["flagship_fixed_vs_baseline"] = round(ref_seconds / secs, 2)
            out["flagship_fixed_tflops"] = (round(tflops, 1)
                                            if tflops is not None else None)
            out["flagship_fixed_precision"] = fixed_prec
            out["flagship_fixed_n_sweeps"] = len(times)
            _provisional(out)
            return out

        try:
            measure_mode("fixed", fixed_prec, svd=os.environ.get(
                "TNML_BENCH_FIXED_SVD", "ritz"),
                n_measured=fixed_sweeps, tag="flagship-fixed ",
                on_sweep=on_fixed_sweep)
        except Exception as e:   # the moving headline must survive any
            out["flagship_fixed_error"] = f"{type(e).__name__}: {e}"
            print(f"[bench] flagship-fixed stage failed: {e}", file=sys.stderr)

    _stage("final result emission", 120.0)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
