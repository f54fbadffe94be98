"""Quality experiment driver: train fixedL (moving label) and log per-sweep test acc.

Usage: python .bench/quality_exp.py <tag> <nt_per_label> <nsweep> <npass> <lam> <ramp> [cconv]
e.g.   python .bench/quality_exp.py npass6 1000 10 6 3e-2 40,60,80,100,120
"""
import sys, os, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, TEST, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel
from tnml_tpu.ops import feature as feat
from tnml_tpu.ops.feature import featurize
from tnml_tpu.eval.fulltest import Evaluator

tag, nt, nsweep, npass = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
lam, ramp = float(sys.argv[5]), [int(x) for x in sys.argv[6].split(",")]
cconv = float(sys.argv[7]) if len(sys.argv) > 7 else 1e-10
alpha = float(sys.argv[8]) if len(sys.argv) > 8 else 1.0
prec = sys.argv[9] if len(sys.argv) > 9 else None
label_mode = sys.argv[10] if len(sys.argv) > 10 else "moving"
monotone = bool(int(sys.argv[11])) if len(sys.argv) > 11 else False
feature = sys.argv[12] if len(sys.argv) > 12 else "series"
d = int(sys.argv[13]) if len(sys.argv) > 13 else 2
rescale = float(sys.argv[14]) if len(sys.argv) > 14 else 1.0 / 255.0
svd_method = sys.argv[15] if len(sys.argv) > 15 else "gram"

tr = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=nt, verbose=False)
te = read_mnist("/root/reference/mllib/MNIST", TEST, nt=1000, verbose=False)
X = featurize(tr.images, feature, d=d, rescale=rescale)
Xte = featurize(te.images, feature, d=d, rescale=rescale)
cfg = FixedLConfig(nsweep=nsweep, maxm=max(ramp), cutoff=1e-10, lam=lam, alpha=alpha,
                   npass=npass, cconv=cconv, method="fast_conj_exact",
                   label_mode=label_mode, pad=max(ramp), maxm_schedule=ramp,
                   env_dtype="bf16", precision=prec, report_cost=True,
                   monotone=monotone, svd_method=svd_method)
wd = tempfile.mkdtemp(prefix=f"qexp_{tag}_")
model = FixedLModel.initialize(X, tr.labels, cfg, workdir=wd, verbose=False)
ev = Evaluator(Xte, te.labels)
best = [0.0]
t0 = time.time()

seen = [0]

def hook(sw, eng, history):
    acc = ev.evaluate_engine(eng).accuracy
    best[0] = max(best[0], acc)
    c = history[-1].cost / eng.nt if history else float("nan")
    new = history[seen[0]:]
    seen[0] = len(history)
    nrej = sum(st.replaced for st in new)
    extra = ""
    if monotone and len(new) > 1:
        # chain consistency: entry cost at bond t+1 (AUX) vs post cost at bond t
        jumps = [new[i + 1].aux - new[i].cost for i in range(len(new) - 1)]
        pos = [j for j in jumps if j > 0]
        extra = (f" chain+={len(pos)}/{len(jumps)}"
                 f" maxjump={max(jumps)/eng.nt:.2e}"
                 f" sumpos={sum(pos)/eng.nt:.2e}")
    print(f"[{tag}] sweep {sw}: cost/NT {c:.6f} test_acc {acc*100:.2f}% "
          f"(best {best[0]*100:.2f}%) rej={nrej} t={time.time()-t0:.0f}s{extra}",
          flush=True)

model.train(X, tr.labels, cfg, workdir=wd, per_sweep_hook=hook, verbose=False)
print(f"[{tag}] BEST {best[0]*100:.2f}%", flush=True)
