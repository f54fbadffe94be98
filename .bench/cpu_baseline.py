#!/usr/bin/env python
"""Measured CPU baseline for bench.py's vs_cpu figure (VERDICT r2 item 5).

Times the engine's OWN per-bond kernel (step.fused_bond_step — the hot path the
whole sweep is built from) on the JAX CPU backend at the exact headline shapes
(B=58862, pad=120, npass=4, fixed label in the far wing), plus a raw matmul
GFLOP/s probe for context.  Writes .bench/cpu_baseline.json, which bench.py
reads to report a MEASURED vs_cpu next to the analytic vs_baseline.

This host has ONE CPU core; the reference binary runs up to 16 pthreads
(paralleldo.h:55-56) on a workstation.  The JSON therefore records the
single-core figure and bench.py scales it by the reference's 16-thread cap
(perfect-scaling assumption — generous to the reference, since its per-thread
BLAS is pinned to 1 thread and its reduction is serial, fixedL.cc:385).

Run: JAX_PLATFORMS=cpu python .bench/cpu_baseline.py
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the axon TPU plugin ignores JAX_PLATFORMS from the environment alone; the
# config API is the hard override (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _time_bond(B, pad, npass, d, nl, mode):
    """One fused_bond_step at the headline shapes: mode 'fixed' puts the label
    axis in the far wing (segment A/B situation), 'moving' on the left core."""
    from tnml_tpu.train import step as step_ops

    rng = np.random.default_rng(0)
    wr = jnp.asarray(rng.normal(size=(pad, d, pad)) / pad, jnp.float32)
    LE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
    if mode == "fixed":
        wl = jnp.asarray(rng.normal(size=(pad, d, pad)) / pad, jnp.float32)
        RE = jnp.asarray(rng.normal(size=(B, nl, pad)).astype(np.float32))
        leg = "none"
    else:
        wl = jnp.asarray(rng.normal(size=(pad, d, pad, nl)) / pad, jnp.float32)
        RE = jnp.asarray(rng.normal(size=(B, pad)), jnp.float32)
        leg = "left"
    lsc = jnp.zeros((B,), jnp.float32)
    rsc = jnp.zeros((B,), jnp.float32)
    xl = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(d, B)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nl, size=B), jnp.int32)
    Y = jnp.eye(nl, dtype=jnp.float32)[labels]
    hyp_f = jnp.asarray([1e-3, 1e-10, 1e-10, 1e-8, 0.0, 1.0], jnp.float32)
    hyp_i = jnp.asarray([pad, 10, 10], jnp.int32)
    key = jnp.zeros((1,), jnp.uint32)

    def bond():
        out = step_ops.fused_bond_step(
            wl, wr, LE, lsc, RE, rsc, xl, xr, Y, labels, hyp_f, hyp_i, key,
            label_leg=leg, iso_left=True, method="fast_conj_exact",
            npass=npass, check_r0=False, report=True, shift_report=True, nl=nl)
        jax.block_until_ready(out)

    t0 = time.time(); bond(); compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        bond()
    return (time.time() - t0) / reps, compile_s


def main():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    B = int(os.environ.get("CPU_BASE_B", 58862))
    pad = int(os.environ.get("CPU_BASE_MAXM", 120))
    npass = int(os.environ.get("CPU_BASE_NPASS", 4))
    d, nl = 2, 10

    rng = np.random.default_rng(0)
    out = {
        "backend": "jax-cpu",
        "host_cores": os.cpu_count(),
        "config": {"B": B, "maxm": pad, "npass": npass, "nl": nl, "d": d,
                   "method": "fast_conj_exact"},
        "note": "engine's own fused_bond_step on the CPU backend; scale by "
                "min(16, cores) for the reference's thread cap",
    }
    for mode in ("fixed", "moving"):
        per_bond_s, compile_s = _time_bond(B, pad, npass, d, nl, mode)
        out[f"per_bond_s_1core_{mode}"] = round(per_bond_s, 3)
        out[f"compile_s_{mode}"] = round(compile_s, 1)
        print(f"[cpu] {mode}: {per_bond_s:.3f} s/bond", file=sys.stderr)

    # raw matmul probe at the hot shape for context (GFLOP/s, f32)
    A = jnp.asarray(rng.normal(size=(B, pad * d)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(pad * d, pad * d * nl)), jnp.float32)
    mm = jax.jit(lambda a, b: a @ b)
    jax.block_until_ready(mm(A, Bm))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(mm(A, Bm))
    mm_s = (time.time() - t0) / 3
    out["matmul_gflops_1core"] = round(
        2 * B * (pad * d) * (pad * d * nl) / mm_s / 1e9, 1)

    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
