"""Random training-image selection with the reference's sampling semantics."""

from __future__ import annotations

import numpy as np


def rand_imgs(rng: np.random.Generator, labels: np.ndarray, label: int,
              k: int) -> np.ndarray:
    """k random indices of images with the given label, by rejection sampling.

    Parity with the reference's ``randImg`` (util.h:104-121): draw uniform over
    the WHOLE training set and reject until the label matches, once per needed
    image — so repeats are possible (the reference draws independently each
    call) and the acceptance distribution is uniform over the label's images.
    Like the reference (which errors after 1000 tries, util.h:115-118), a very
    rare label cannot spin unboundedly: after ``max_tries`` rejections the draw
    falls back to a direct uniform pick from the label's index set — the same
    acceptance distribution, without the reference's hard failure.
    """
    idx = np.flatnonzero(np.asarray(labels) == label)
    if len(idx) == 0:
        raise ValueError(f"no training images with label {label}")
    out = np.empty(k, dtype=np.int64)
    n = len(labels)
    max_tries = 1000
    for i in range(k):
        for _ in range(max_tries):
            j = int(rng.integers(0, n))
            if labels[j] == label:
                break
        else:
            j = int(idx[rng.integers(0, len(idx))])
        out[i] = j
    return out
