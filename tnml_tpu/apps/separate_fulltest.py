"""separate_fulltest app: evaluate ten one-vs-rest MPS on the test set
(reference: separate_fulltest.cc:86-170).

Usage: python -m tnml_tpu.apps.separate_fulltest <inputfile>

Loads ``L0/W0 .. L9/W9`` from the cwd (the reference's L%d/W%d layout,
separate_fulltest.cc:158; the per-label dirs are created by the user).  The feature
map is hardcoded 'normal' like the reference (its ftype is never read from input,
separate_fulltest.cc:109-110) unless you pass ``feature =`` explicitly.
"""

from __future__ import annotations

import os
import sys

from tnml_tpu.apps import common
from tnml_tpu.data.mnist import TEST
from tnml_tpu.eval.fulltest import separate_full_test
from tnml_tpu.io import checkpoint as ckpt


def main(argv=None) -> int:
    cfg = common.load_config(argv or sys.argv)
    meta = common.require_sites(".")
    feature = cfg.get_string("feature", "normal")

    X, labels = common.load_features(cfg, TEST, feature, nt=2**30, d=meta["d"])
    print(f"Total of {X.shape[0]} testing images")

    ws = []
    for n in range(10):
        path = os.path.join(f"L{n}", f"W{n}")
        if not os.path.exists(path):
            raise SystemExit(f"Couldn't find file '{path}'")
        ws.append(ckpt.load_mps(path))

    print("Running full test")
    rep = separate_full_test(ws, X, labels)
    rep.print_summary()
    return 0


if __name__ == "__main__":
    sys.exit(main())
