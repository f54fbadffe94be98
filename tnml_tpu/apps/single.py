"""single app: train a one-vs-rest MPS for one label (reference: single.cc:6-244).

Usage: python -m tnml_tpu.apps.single <inputfile>

Required parameter: ``label`` (0-9).  Output checkpoint: ``W<label>``
(format("W%d",L), single.cc:53).  Default feature map is 'normal' (cos/sin,
single.cc:29), unlike fixedL's hardcoded 'series'.
"""

from __future__ import annotations

import sys

from tnml_tpu.apps import common
from tnml_tpu.data.mnist import TRAIN
from tnml_tpu.models.single import SingleConfig, SingleModel


def main(argv=None) -> int:
    cfg = common.load_config(argv or sys.argv)

    maxm = cfg.get_int("maxm", 5000)
    sc = SingleConfig(
        label=cfg.get_int("label", 0),
        nsweep=cfg.get_int("Nsweep", 50),
        maxm=maxm,
        minm=cfg.get_int("minm", max(10, maxm // 2)),
        cutoff=cfg.get_real("cutoff", 1e-8),
        noise=cfg.get_real("noise", 0.0),
        lam=cfg.get_real("lambda", 0.0),
        alpha=cfg.get_real("alpha", 1.0),
        npass=cfg.get_int("Npass", 4),
        cconv=cfg.get_real("cconv", 1e-10),
        method=cfg.get_string("method", "conj"),
        ntarget=cfg.get_int("Ntarget", 10),
        pcut=cfg.get_real("pcut", 1e-8),
        ninitial=cfg.get_int("ninitial", 100),
        monotone=cfg.get_yesno("monotone", False),
        report_cost=cfg.get_yesno("report_cost", True),
        pad=cfg.get_int("pad", 0) or None,
        pause_steps=cfg.get_yesno("pause_steps", False),
        env_dtype=cfg.get_string("env_dtype", "") or None,
        precision=cfg.get_string("precision", "") or None,
    )

    feature = cfg.get_string("feature", "normal")
    X, labels = common.load_features(cfg, TRAIN, feature)
    n = X.shape[1]
    print(f"{n} sites")
    print(f"Total of {X.shape[0]} training images")
    n_tgt = int((labels == sc.label).sum())
    print(f"{n_tgt} training images with selected label L={sc.label}")
    common.ensure_sites(".", n, 2)

    sharding = None
    ndp = cfg.get_int("dp", 0)
    if ndp:
        from tnml_tpu.parallel.mesh import DataParallel, make_mesh
        sharding = DataParallel(make_mesh(ndp))

    model = SingleModel.initialize(X, labels, sc, workdir=".")
    model.train(X, labels, sc, workdir=".", sharding=sharding, verbose=True)
    print(f"Writing {sc.wname} to disk")
    model.save(sc.wname)
    return 0


if __name__ == "__main__":
    sys.exit(main())
