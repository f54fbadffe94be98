"""One-vs-rest family AND warm-start compositions at scale (VERDICT r4 item 4).

Stages (run one per process; each logs per-sweep progress):

  singles <nt_per_label> <nsweep> <maxm>   — train 10 `single` MPS on the full
      train set (single.cc defaults scale to 60k, single.cc:18-51), save W%d
      under .bench/r5_family_wd/, then separate_fulltest on the test set
      (the single.cc -> separate_fulltest.cc pipeline).
  merge <nt> <nsweep> <maxm>   — fixedL warm-started by MERGING W0..W9 (init
      path b, fixedL.cc:682-701) in the same workdir; per-sweep held-out acc.
  cold <nt> <nsweep> <maxm>    — fixedL cold start (init path c) on the same
      data, the control arm for sweeps-to-target.
  linear_init <nt> <nsweep> <maxm> — linear baseline -> exact bond-2 W%d export
      (the Novikov init, README.md:95-99, linear.cc:205-236) -> fixedL merge
      warm start from those in a fresh workdir.

Featurization: the singles/merge/cold arms share the quality anchor's map
(normal, rescale 0.1).  The linear arm MUST use the series map on raw [0,1]
pixels — the bond-2 embedding IS the series basis W(x) = V0 + sum V_j (x_j/4)
(linear.cc:118-141,205-236); the reference's linear/fixedL feature-scale
mismatch quirk (SURVEY.md §2) is deliberately not reproduced: the child runs
on the same series/rescale=1 features the parent was trained on.
Synthetic digits (no image files in this environment) — accuracy numbers are
NOT comparable to published MNIST.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, TEST, read_mnist
from tnml_tpu.ops.feature import featurize
from tnml_tpu.eval.fulltest import Evaluator, separate_full_test

WD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_family_wd")
os.makedirs(WD, exist_ok=True)

stage = sys.argv[1]
nt = int(sys.argv[2])
nsweep, maxm = int(sys.argv[3]), int(sys.argv[4])

tr = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=nt, verbose=False)
te = read_mnist("/root/reference/mllib/MNIST", TEST, nt=1000, verbose=False)
t0 = time.time()


def feats(feature, rescale):
    X = featurize(tr.images, feature, d=2, rescale=rescale)
    Xte = featurize(te.images, feature, d=2, rescale=rescale)
    print(f"[family:{stage}] {X.shape[0]} train, {Xte.shape[0]} test "
          f"({feature}, rescale={rescale})", flush=True)
    return X, Xte


def run_fixedl(tag, workdir, X, Xte, lam=3e-2):
    from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel
    cfg = FixedLConfig(nsweep=nsweep, maxm=maxm, cutoff=1e-10, lam=lam,
                       npass=4, cconv=1e-10, method="fast_conj_exact",
                       label_mode="fixed", pad=maxm, env_dtype="bf16",
                       monotone=True, ninitial=10, report_cost=True)
    model = FixedLModel.initialize(X, tr.labels, cfg, workdir=workdir,
                                   verbose=True)
    print(f"[family:{tag}] init bond {model.w.max_bond()} "
          f"t={time.time()-t0:.0f}s", flush=True)
    ev = Evaluator(Xte, te.labels)
    best = [0.0]

    def hook(sw, eng, history):
        acc = ev.evaluate_engine(eng).accuracy
        best[0] = max(best[0], acc)
        c = history[-1].cost / eng.nt if history else float("nan")
        print(f"[family:{tag}] sweep {sw}: cost/NT {c:.6f} "
              f"test_acc {acc*100:.2f}% (best {best[0]*100:.2f}%) "
              f"t={time.time()-t0:.0f}s", flush=True)

    model.train(X, tr.labels, cfg, workdir=workdir, per_sweep_hook=hook,
                verbose=False)
    print(f"[family:{tag}] BEST {best[0]*100:.2f}%", flush=True)


if stage == "singles":
    X, Xte = feats("normal", 0.1)
    from tnml_tpu.models.single import SingleConfig, SingleModel
    ws = []
    for label in range(10):
        cfg = SingleConfig(label=label, nsweep=nsweep, maxm=maxm, cutoff=1e-10,
                           lam=1e-8, npass=4, cconv=1e-10,
                           method="fast_conj_exact", ninitial=10, pad=maxm,
                           env_dtype="bf16", report_cost=False)
        m = SingleModel.initialize(X, tr.labels, cfg, workdir=WD, verbose=False)
        m.train(X, tr.labels, cfg, workdir=WD, verbose=False)
        ws.append(m.w)
        print(f"[family:singles] label {label} trained, bond "
              f"{m.w.max_bond()}, t={time.time()-t0:.0f}s", flush=True)
    rep = separate_full_test(ws, Xte, te.labels)
    rep.print_summary()
elif stage == "merge":
    # W0..W9 must exist in WD (run `singles` first); fixedL.initialize finds
    # them and merges (init path b)
    X, Xte = feats("normal", 0.1)
    if os.path.exists(os.path.join(WD, "W")):
        os.remove(os.path.join(WD, "W"))
    run_fixedl("merge", WD, X, Xte)
elif stage == "cold":
    X, Xte = feats("normal", 0.1)
    cwd = WD + "_cold"
    os.makedirs(cwd, exist_ok=True)
    p = os.path.join(cwd, "W")
    if os.path.exists(p):
        os.remove(p)
    run_fixedl("cold", cwd, X, Xte)
elif stage == "linear_init":
    # the bond-2 export is the series basis on RAW [0,1] pixels
    X, Xte = feats("series", 1.0)
    lwd = WD + "_linear"
    os.makedirs(lwd, exist_ok=True)
    for f in [f"W{l}" for l in range(10)] + ["W"]:
        p = os.path.join(lwd, f)
        if os.path.exists(p):
            os.remove(p)
    from tnml_tpu.models.linear import (evaluate_linear, linear_cgrad,
                                        linear_features, linear_to_mps)
    from tnml_tpu.io import checkpoint as ckpt
    Xf = linear_features(tr.images)
    Xfte = linear_features(te.images)
    rng = np.random.default_rng(0)
    for label in range(10):
        V = rng.normal(size=Xf.shape[1])
        V /= np.linalg.norm(V)
        y = np.where(tr.labels == label, 1.0, -1.0)
        V, C = linear_cgrad(V, Xf, y, npass=60, lam=1e-3, verbose=False)
        acc = evaluate_linear(V, Xfte,
                              np.where(te.labels == label, 1.0, -1.0),
                              1e-3, verbose=False)
        w = linear_to_mps(V, tr.images.shape[1])
        w.compress(cutoff=1e-14)
        ckpt.save_mps(os.path.join(lwd, f"W{label}"), w)
        print(f"[family:linear] label {label}: test sign-acc {acc*100:.2f}% "
              f"-> bond-2 MPS, t={time.time()-t0:.0f}s", flush=True)
    run_fixedl("linear_init", lwd, X, Xte, lam=1e-3)
else:
    raise SystemExit(f"unknown stage {stage!r}")
