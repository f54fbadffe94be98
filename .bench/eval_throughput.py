#!/usr/bin/env python
"""Inference/serving throughput of the batched fulltest evaluator.

The reference's fulltest contracts ONE test image at a time through toverlap
(util.h:19-40) inside a serial loop over the test set (util.h:123-200) — a
single-core, per-image walk of 784 sites.  Our Evaluator contracts the whole
test set in one batched device sweep (eval/fulltest.py), reusing the training
env_extend kernels.  This script measures end-to-end images/s of the warm
jitted path at trained-model shapes (N=784, m=120, 10-dim label at c=N/2),
plus an analytic single-core reference estimate on the same contraction
counts for scale.

Usage: python .bench/eval_throughput.py [B=10000] [m=120] [reps=5]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax

    from tnml_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from tnml_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tnml_tpu.data.mnist import TEST, read_mnist
    from tnml_tpu.eval.fulltest import Evaluator
    from tnml_tpu.mps.core import MPS
    from tnml_tpu.mps.pack import pack
    from tnml_tpu.ops.feature import FEATURE_SERIES, featurize

    print(f"[eval-bench] devices: {jax.devices()}", file=sys.stderr)
    ds = read_mnist("/root/reference/mllib/MNIST", TEST, nt=max(1, B // 10),
                    size=28, verbose=False)
    X = featurize(ds.images[:B], FEATURE_SERIES, d=2)
    labels = ds.labels[:B]
    n, d, nl = X.shape[1], X.shape[2], 10
    c = n // 2

    # random trained-shape W: accuracy is irrelevant for throughput; per-core
    # scaling keeps the contraction inside the evaluator's log-scale hygiene
    rng = np.random.default_rng(0)
    cores = []
    for j in range(n):
        ml = 1 if j == 0 else m
        mr = 1 if j == n - 1 else m
        shape = (ml, d, mr, nl) if j == c else (ml, d, mr)
        a = rng.standard_normal(shape)
        cores.append(a / np.sqrt(a.size))
    w = MPS(cores, label_site=c)
    packed = pack(w, pad=m)

    ev = Evaluator(X, labels)
    t0 = time.time()
    ev.evaluate(packed)  # compile + warm
    print(f"[eval-bench] warm call (compile): {time.time() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        rep = ev.evaluate(packed)  # np.asarray inside forces device sync
        times.append(time.time() - t0)
    best = min(times)
    mean = float(np.mean(times))
    ips = B / mean

    # analytic single-core reference estimate on the same contraction counts:
    # per site, wing[m] x core[m,d,m] with the product state's phi[d] folded in
    # ~ 2*m*m*d flops (label core: x nl), f64 at ~3 GFLOP/s (the same
    # per-thread rate bench.py grants the reference; fullTest is serial)
    ref_flops_img = (n - 1) * 2 * m * m * d + 2 * m * m * d * nl
    ref_ips = 3e9 / ref_flops_img

    print(f"[eval-bench] B={B} m={m} N={n}: mean {mean * 1e3:.1f} ms/call "
          f"(best {best * 1e3:.1f}), {ips:,.0f} images/s "
          f"(~{mean / B * 1e6:.1f} us/image)", file=sys.stderr)
    print(f"[eval-bench] analytic 1-core reference: ~{ref_ips:,.0f} images/s "
          f"-> speedup ~{ips / ref_ips:,.0f}x", file=sys.stderr)
    import json
    print(json.dumps({"metric": f"fulltest eval throughput (B={B}, N={n}, "
                                f"m={m}, labeled)",
                      "value": round(ips), "unit": "images/s",
                      "ms_per_call_mean": round(mean * 1e3, 1),
                      "vs_ref_analytic_1core": round(ips / ref_ips, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
