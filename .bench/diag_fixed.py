"""Diagnose the fixed-label (reference flagship) training stall.

Runs the reference smoke config shape (100/label, maxm=40, series map, double-/255,
lambda=1e-3, npass=2, method=conj, label FIXED at c=N/2) with a selectable
split method and precision, logging per-sweep cost + train/test accuracy.

Usage: python .bench/diag_fixed.py <tag> <platform:tpu|cpu> <dtype:f32|f64> \
       <split:gram|svd> <nsweep> [npass] [lam] [nt_per_label]
"""
import sys, os, time

tag, platform, dtype_s, split = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
nsweep = int(sys.argv[5])
npass = int(sys.argv[6]) if len(sys.argv) > 6 else 2
lam = float(sys.argv[7]) if len(sys.argv) > 7 else 1e-3
ntl = int(sys.argv[8]) if len(sys.argv) > 8 else 100

if platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
if dtype_s == "f64":
    os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, "/root/repo")
import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, TEST, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, cold_start
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps
from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
from tnml_tpu.eval.fulltest import full_test

dtype = jnp.float64 if dtype_s == "f64" else jnp.float32

tr = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=ntl, verbose=False)
te = read_mnist("/root/reference/mllib/MNIST", TEST, nt=100, verbose=False)
X = featurize(tr.images, FEATURE_SERIES, d=2)
Xte = featurize(te.images, FEATURE_SERIES, d=2)
print(f"[{tag}] B={X.shape[0]} N={X.shape[1]} platform={jax.devices()[0].platform} "
      f"dtype={dtype_s} split={split} npass={npass} lam={lam}", flush=True)

w = cold_start(X, tr.labels, ninitial=2, verbose=False)
pad = 48
eng = SweepEngine(pack(w, pad, dtype=dtype), X, tr.labels, lam=lam, npass=npass,
                  cconv=1e-10, method="conj", label_mode="fixed", dtype=dtype,
                  svd_method=split, report_cost=True)
eng.init_envs()
cost, _, ncor, _ = eng.quadcost(0)
print(f"[{tag}] init cost/NT {float(cost)/eng.nt:.8f} correct {int(ncor)}/{eng.nt}",
      flush=True)

t0 = time.time()
for sw in range(nsweep):
    hist = eng.run(Sweeps.constant(1, 20, 40, 1e-12), verbose=False)
    last = hist[-1]
    maxm_now = int(eng.ranks.max())
    # held-out accuracy
    acc = float("nan")
    try:
        rep = full_test(unpack(eng.packed()), Xte, te.labels)
        acc = rep.accuracy
    except Exception as e:
        print(f"[{tag}] eval failed: {e}", flush=True)
    print(f"[{tag}] sweep {sw+1}: cost/NT {last.cost/eng.nt:.8f} "
          f"train_correct {last.ncorrect}/{eng.nt} maxm {maxm_now} "
          f"test_acc {acc*100:.1f}% t={time.time()-t0:.0f}s", flush=True)
