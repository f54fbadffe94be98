"""Time one fused moving-label sweep under config variants to locate the cost.

Usage: sweep_variants.py [B] [variant ...]
Variants: base (npass=4,report=1), norep, np2, np1, conj, f32env
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel, cold_start
from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
from tnml_tpu.train.schedule import Sweeps

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
variants = sys.argv[2:] or ["base", "norep", "np2", "np1", "mono"]
maxm = 120

ds = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=max(1, B // 10),
                verbose=False)
X = featurize(ds.images, FEATURE_SERIES, d=2)
print(f"[variants] B={X.shape[1] if X.ndim==3 else len(ds.labels)} images",
      file=sys.stderr)

VAR = {
    "base":  dict(),
    "norep": dict(report_cost=False),
    "np2":   dict(npass=2),
    "np1":   dict(npass=1),
    "conj":  dict(method="conj"),
    "f32env": dict(env_dtype=None),
    "mono":  dict(monotone=True),
}

for v in variants:
    kw = dict(nsweep=1, maxm=maxm, cutoff=1e-10, lam=1e-3, npass=4,
              ninitial=10, pad=maxm, label_mode="moving",
              method="fast_conj_exact", precision="default",
              env_dtype="bf16", report_cost=True)
    ov = VAR[v]
    env_override = ov.pop("env_dtype", "unset")
    kw.update(ov)
    cfg = FixedLConfig(**kw)
    w = cold_start(X, ds.labels, ninitial=10, verbose=False)
    eng = FixedLModel(w).make_engine(X, ds.labels, cfg, pad=maxm)
    if env_override != "unset":
        eng.env_dtype = env_override
    sweeps1 = Sweeps.constant(1, 10, maxm, 1e-10)
    t0 = time.time()
    eng.run_fused(sweeps1, verbose=False)
    warm = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        eng.run_fused(sweeps1, verbose=False)
        times.append(time.time() - t0)
    print(f"{v:8s} warm={warm:6.1f}s  sweep={np.mean(times):6.2f}s "
          f"(runs: {', '.join(f'{t:.2f}' for t in times)})", flush=True)
