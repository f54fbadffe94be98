"""One-vs-rest family at scale: train 10 `single` MPS on the full train set
(normal map, intermediate rescale), then evaluate with separate_full_test —
the single.cc -> separate_fulltest.cc pipeline (SURVEY.md §2 rows 2 and 4).

Usage: single_family_demo.py [nt_per_label] [nsweep] [maxm]
"""
import sys, time, os, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, TEST, read_mnist
from tnml_tpu.models.single import SingleConfig, SingleModel
from tnml_tpu.ops.feature import featurize
from tnml_tpu.eval.fulltest import separate_full_test

nt = int(sys.argv[1]) if len(sys.argv) > 1 else 600
nsweep = int(sys.argv[2]) if len(sys.argv) > 2 else 3
maxm = int(sys.argv[3]) if len(sys.argv) > 3 else 60

tr = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=nt, verbose=False)
te = read_mnist("/root/reference/mllib/MNIST", TEST, nt=1000, verbose=False)
X = featurize(tr.images, "normal", d=2, rescale=0.1)
Xte = featurize(te.images, "normal", d=2, rescale=0.1)
print(f"[single-demo] {X.shape[0]} train, {Xte.shape[0]} test", flush=True)

ws = []
t0 = time.time()
for label in range(10):
    cfg = SingleConfig(label=label, nsweep=nsweep, maxm=maxm, cutoff=1e-10,
                       lam=1e-8, npass=4, cconv=1e-10,
                       method="fast_conj_exact", ninitial=10, pad=maxm,
                       report_cost=False)
    wd = tempfile.mkdtemp(prefix=f"single{label}_")
    m = SingleModel.initialize(X, tr.labels, cfg, workdir=wd, verbose=False)
    m.train(X, tr.labels, cfg, workdir=wd, verbose=False)
    ws.append(m.w)
    print(f"[single-demo] label {label} trained t={time.time()-t0:.0f}s",
          flush=True)

rep = separate_full_test(ws, Xte, te.labels)
rep.print_summary()
