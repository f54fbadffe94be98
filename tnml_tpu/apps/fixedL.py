"""fixedL app: train the multiclass fixed-label MPS (reference: fixedL.cc:573-767).

Usage: python -m tnml_tpu.apps.fixedL <inputfile>

Input parameters (README.md:65-79 names/defaults): datadir, Ntrain, Nbatch, Nsweep,
cutoff, maxm, minm, ninitial, nthread, lambda, method, Npass, cconv, feature,
replace (revert-on-worse, realized), alpha (bond-update damping, realized), clip
(accepted for parity; dead in the reference too, SURVEY.md §2), plus new TPU-side
knobs: rescale (reference|fixed), pad, report_cost,
dp (shard the batch over this many devices), seed.

The reference hardcodes the 'series' feature map here (fixedL.cc:637-642, the
`feature` input is commented out at :598); we default to series but honor an explicit
`feature =` line.
"""

from __future__ import annotations

import sys

import numpy as np

from tnml_tpu.apps import common
from tnml_tpu.data.mnist import TRAIN
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel


def _parse_schedule(text: str):
    try:
        vals = [int(x) for x in text.split(",") if x.strip()]
    except ValueError:
        raise SystemExit(f"maxm_schedule={text!r}: expected comma-separated ints")
    return vals or None


def main(argv=None) -> int:
    cfg = common.load_config(argv or sys.argv)

    d = cfg.get_int("d", 2)
    maxm = cfg.get_int("maxm", 5000)
    fl = FixedLConfig(
        nsweep=cfg.get_int("Nsweep", 50),
        maxm=maxm,
        minm=cfg.get_int("minm", max(10, maxm // 2)),
        cutoff=cfg.get_real("cutoff", 1e-10),
        lam=cfg.get_real("lambda", 0.0),
        alpha=cfg.get_real("alpha", 1.0),
        npass=cfg.get_int("Npass", 4),
        cconv=cfg.get_real("cconv", 1e-10),
        method=cfg.get_string("method", "conj"),
        ninitial=cfg.get_int("ninitial", 100),
        report_cost=cfg.get_yesno("report_cost", True),
        pad=cfg.get_int("pad", 0) or None,
        label_mode=cfg.get_string("label_mode", "fixed"),
        replace=cfg.get_yesno("replace", False),
        monotone=cfg.get_yesno("monotone", False),
        keep_best=cfg.get_yesno("keep_best", False),
        maxm_schedule=_parse_schedule(cfg.get_string("maxm_schedule", "")),
        env_dtype=cfg.get_string("env_dtype", "") or None,
        mxu_dtype=cfg.get_string("mxu_dtype", "") or None,
        # defer to FixedLConfig's default (ritz since round 5) when unset
        svd_method=cfg.get_string("svd_method", "") or FixedLConfig.svd_method,
        precision=cfg.get_string("precision", "") or None,
        dotest=cfg.get_yesno("dotest", False),
        profile_dir=cfg.get_string("profile", "") or None,
        pause_step=cfg.get_yesno("pause_step", False),
    )

    if fl.maxm_schedule:
        fl.maxm = max(fl.maxm, max(fl.maxm_schedule))

    if fl.alpha != 1.0:
        # the reference parses `alpha` but never uses it (fixedL.cc:605); here it
        # is REALIZED as bond-update damping — warn so a config ported verbatim
        # from the reference is not silently slowed down by its dead default
        print(f"NOTE: alpha = {fl.alpha} is live in tnml-tpu (bond-update damping "
              f"B <- (1-alpha)*B0 + alpha*B_cg); the reference reads but ignores "
              f"this parameter.")

    feature = cfg.get_string("feature", "series")
    X, labels = common.load_features(cfg, TRAIN, feature, d=d)
    n = X.shape[1]
    print(f"{n} sites of dimension {d}")
    print(f"Total of {X.shape[0]} training images")
    common.ensure_sites(".", n, d)

    sharding = None
    ndp = cfg.get_int("dp", 0)
    if ndp:
        from tnml_tpu.parallel.mesh import DataParallel, make_mesh
        sharding = DataParallel(make_mesh(ndp))
        # the batch axis must divide the mesh; pad with inert zero-feature rows
        nb = X.shape[0]
        X, labels = sharding.pad_dataset(X, labels)
        if X.shape[0] != nb:
            print(f"[dp] padded batch {nb} -> {X.shape[0]} "
                  f"(multiple of {sharding.n} devices)")

    # Nbatch > 1 is the reference's out-of-core memory knob (README.md:77);
    # the TPU analog demotes cold wings to host RAM ('host') or the native
    # file spool ('spool').
    offload = cfg.get_string("offload",
                             "host" if cfg.get_int("Nbatch", 1) > 1 else "none")
    if offload not in ("none", "host", "spool"):
        raise SystemExit(f"offload={offload!r} not recognized (none|host|spool)")
    env_store = None
    if offload != "none":
        from tnml_tpu.train.envstore import OffloadEnvStore
        env_store = OffloadEnvStore(
            keep=3, spool_dir=".tnml_spool" if offload == "spool" else None)
        fl_env_note = f"[tnml] wing offload: {offload}"
        print(fl_env_note)

    # dotest = yes: per-sweep held-out evaluation (in-training fulltest); with
    # keep_best the best-test-accuracy sweep checkpoint is the one kept
    test_data = None
    if fl.dotest:
        from tnml_tpu.data.mnist import TEST
        ntest = cfg.get_int("Ntest", 10000)
        Xte, lte = common.load_features(cfg, TEST, feature, nt=ntest, d=d)
        test_data = (Xte, lte)
        print(f"dotest: evaluating {Xte.shape[0]} held-out images per sweep")

    # log = sweep (default) | bond: 'bond' replays the reference's full per-bond
    # report (fixedL.cc:490-533) from the bulk-fetched stats
    verbose = "bond" if cfg.get_string("log", "sweep") == "bond" else True
    model = FixedLModel.initialize(X, labels, fl, workdir=".")
    model.train(X, labels, fl, workdir=".", sharding=sharding, verbose=verbose,
                env_store=env_store, test_data=test_data)
    print("Writing W to disk")
    model.save("W")
    return 0


if __name__ == "__main__":
    sys.exit(main())
