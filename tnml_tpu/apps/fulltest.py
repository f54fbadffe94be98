"""fulltest app: evaluate a trained fixedL MPS on the test set
(reference: fulltest.cc:7-100).

Usage: python -m tnml_tpu.apps.fulltest <inputfile>

Reads `sites` and the weight MPS (`fname`, default "W") from the cwd, encodes the
test set with the configured feature map (default here is 'series', matching
fulltest.cc:20), and prints total + per-digit accuracy (util.h:186-199).
"""

from __future__ import annotations

import sys

from tnml_tpu.apps import common
from tnml_tpu.data.mnist import TEST
from tnml_tpu.eval.fulltest import full_test
from tnml_tpu.io import checkpoint as ckpt


def main(argv=None) -> int:
    cfg = common.load_config(argv or sys.argv)
    meta = common.require_sites(".")
    fname = cfg.get_string("fname", "W")
    feature = cfg.get_string("feature", "series")

    X, labels = common.load_features(cfg, TEST, feature, nt=2**30, d=meta["d"])
    if X.shape[1] != meta["N"]:
        raise SystemExit(f"test images have {X.shape[1]} sites, sites file {meta['N']}")
    print(f"Total of {X.shape[0]} testing images")

    try:
        w = ckpt.load_mps(fname)
    except FileNotFoundError:
        raise SystemExit(f"Couldn't find file '{fname}'")
    print(f"Running full test of {fname}")
    rep = full_test(w, X, labels)
    rep.print_summary()
    return 0


if __name__ == "__main__":
    sys.exit(main())
