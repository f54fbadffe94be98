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
    The caller must ensure at least one image with the label exists.
    """
    idx = np.flatnonzero(np.asarray(labels) == label)
    if len(idx) == 0:
        raise ValueError(f"no training images with label {label}")
    out = np.empty(k, dtype=np.int64)
    n = len(labels)
    for i in range(k):
        j = int(rng.integers(0, n))
        while labels[j] != label:
            j = int(rng.integers(0, n))
        out[i] = j
    return out
