"""Capture a jax.profiler trace of one steady-state full-set sweep and dump the
per-op self-time table (xprof framework_op_stats) for the VERDICT r2 item-2
breakdown.  Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python .bench/profile_sweep.py [B]

Writes the raw trace under .bench/profile_r3/ and a parsed op table to
.bench/profile_r3_ops.json (list of [rank, type, name, self_us, total_us, occ]).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob

import jax
import numpy as np

from tnml_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from tnml_tpu.data.mnist import TRAIN, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel, cold_start
from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
from tnml_tpu.train.schedule import Sweeps

B = int(sys.argv[1]) if len(sys.argv) > 1 else 58862
maxm, npass = 120, 4
svd_method = os.environ.get("TNML_BENCH_SVD", "gram")
label_mode = os.environ.get("TNML_PROFILE_MODE", "moving")
precision = os.environ.get("TNML_PROFILE_PRECISION",
                           "default" if label_mode == "moving" else "highest")

ds = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=max(1, B // 10),
                size=28, verbose=False)
X = featurize(ds.images, FEATURE_SERIES, d=2)
cfg = FixedLConfig(nsweep=1, maxm=maxm, cutoff=1e-10, lam=1e-3, npass=npass,
                   ninitial=10, pad=maxm, label_mode=label_mode,
                   method="fast_conj_exact", precision=precision,
                   svd_method=svd_method)
w = cold_start(X, ds.labels, ninitial=cfg.ninitial, verbose=False)
model = FixedLModel(w)
eng = model.make_engine(X, ds.labels, cfg, pad=maxm)
import jax.numpy as jnp
eng.env_dtype = jnp.bfloat16

sweeps1 = Sweeps.constant(1, min(10, maxm), maxm, 1e-10)
t0 = time.time()
eng.run_fused(sweeps1, verbose=False)
print(f"warm sweep: {time.time() - t0:.1f}s", file=sys.stderr)

suffix = "" if label_mode == "moving" else f"_{label_mode}"
tag = os.environ.get("TNML_PROFILE_TAG", "r3")
outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      f"profile_{tag}{suffix}")
t0 = time.time()
with jax.profiler.trace(outdir):
    eng.run_fused(sweeps1, verbose=False)
secs = time.time() - t0
print(f"traced sweep: {secs:.2f}s", file=sys.stderr)

xp = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
print("xplanes:", xp, file=sys.stderr)
from xprof.convert import raw_to_tool_data as r2t

data, _ = r2t.xspace_to_tool_data([xp[-1]], "framework_op_stats", {})
s = data if isinstance(data, str) else data.decode()
tab = json.loads(s)
rows = []
for entry in tab:
    cols = [c["id"] for c in entry.get("cols", [])]
    for r in entry.get("rows", []):
        v = [c.get("v") for c in r["c"]]
        rows.append(dict(zip(cols, v)))
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   f"profile_{tag}{suffix}_ops.json")
with open(out, "w") as f:
    json.dump({"sweep_s": secs, "B": B, "svd_method": svd_method,
               "label_mode": label_mode, "precision": precision,
               "rows": rows}, f, indent=1)
print(f"wrote {out} ({len(rows)} rows)", file=sys.stderr)
