"""linear app: dense linear baseline + exact MPS export (reference: linear.cc:92-239).

Usage: python -m tnml_tpu.apps.linear <inputfile>

Trains V<label> by CG (warm-restarts from an existing V<label>), evaluates train and
test sets by sign agreement, then writes the exact bond-dim-2 MPS as W<label> —
usable as fixedL's merge-init warm start (fixedL.cc:682-701).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from tnml_tpu.apps import common
from tnml_tpu.config import read_input_file
from tnml_tpu.data.mnist import TEST, TRAIN, read_mnist
from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.models.linear import (evaluate_linear, linear_cgrad,
                                    linear_features, linear_to_mps)


def main(argv=None) -> int:
    cfg = common.load_config(argv or sys.argv)
    datadir = cfg.get_string("datadir", common.DEFAULT_DATADIR)
    niter = cfg.get_int("Nlinear_iter", 5000)
    ntrain = cfg.get_int("Ntrain", 60000)
    lam = cfg.get_real("lambda", 0.0)
    label = cfg.get_int("label")

    print("Loading training data...", end="")
    train = read_mnist(datadir, TRAIN, nt=ntrain, verbose=False)
    test = read_mnist(datadir, TEST, nt=2**30, verbose=False)
    print("done")
    n = train.n_sites
    print(f"Vector size = {1 + n}")

    Xtr = linear_features(train.images)
    Xte = linear_features(test.images)
    ytr = np.where(train.labels == label, 1.0, -1.0)
    yte = np.where(test.labels == label, 1.0, -1.0)

    vname = f"V{label}"
    if os.path.exists(vname):
        print("Reading parameters from disk")
        V = ckpt.load_vector(vname)
    else:
        rng = np.random.default_rng(0)
        V = rng.normal(size=1 + n)
        V /= np.linalg.norm(V)

    def stop_check():
        ctl = ckpt.poll_control_files(".")
        return bool(ctl.get("stop"))

    V, C = linear_cgrad(V, Xtr, ytr, npass=niter, lam=lam, stop_check=stop_check)

    print("Evaluating training set")
    evaluate_linear(V, Xtr, ytr, lam)
    print("Evaluating testing set")
    evaluate_linear(V, Xte, yte, lam)

    ckpt.save_vector(vname, V)
    common.ensure_sites(".", n, 2)

    w = linear_to_mps(V, n)
    w.compress(cutoff=1e-14)
    print(f"overlap(W,W) = {w.norm() ** 2:.10f}  |V|^2 = {float(V @ V):.10f}")
    ckpt.save_mps(f"W{label}", w)
    return 0


if __name__ == "__main__":
    sys.exit(main())
