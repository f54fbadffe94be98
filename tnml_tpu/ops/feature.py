"""Local feature maps φ(x) applied per pixel.

Reference semantics (all φ lambdas take the *normalized* pixel g ∈ [0,1] produced by
readMNIST, then divide by 255 AGAIN — the documented double-normalization quirk,
SURVEY.md §2; fixedL.cc:637-642, single.cc:71-84, fulltest.cc:57-70):

- ``normal``: [cos(π/2·x), sin(π/2·x)]                  (single.cc:75-78)
- ``series``: [(x/4)^0, (x/4)^1, ..., (x/4)^(d-1)]      (fixedL.cc:641, single.cc:79-82)

``rescale`` controls the second division: ``1/255`` reproduces reference behavior
(default), ``1.0`` is the "fixed" variant where φ sees the true [0,1] pixel value
(what linear.cc:118-122 does).

``featurize`` maps a whole dataset at once to the canonical training-array layout
``X: [B, N, d] float32`` — the batched analog of the reference's per-image flat φ table
(``TState.data``, fixedL.cc:39-47).
"""

from __future__ import annotations

import numpy as np

FEATURE_NORMAL = "normal"
FEATURE_SERIES = "series"
FEATURE_SPIN = "spin"

REFERENCE_RESCALE = 1.0 / 255.0  # the double-/255 quirk, on by default for parity


def phi(x: np.ndarray, feature: str = FEATURE_NORMAL, d: int = 2,
        rescale: float = REFERENCE_RESCALE) -> np.ndarray:
    """Apply the local feature map; output shape = x.shape + (d,).

    ``x`` is expected in [0,1] (readMNIST-normalized); values outside [0,1] raise,
    mirroring the reference's [0,255] guard (fixedL.cc:639).
    """
    x = np.asarray(x, dtype=np.float64)
    if np.any(x < -1e-9) or np.any(x > 1.0 + 1e-9):
        raise ValueError("pixel values must lie in [0,1] (readMNIST-normalized)")
    x = x * rescale
    if feature == FEATURE_NORMAL:
        if d != 2:
            raise ValueError("'normal' feature map requires d=2 (use 'spin' "
                             "for the d-dim generalization)")
        out = np.stack([np.cos(np.pi / 2.0 * x), np.sin(np.pi / 2.0 * x)], axis=-1)
    elif feature == FEATURE_SPIN:
        # the paper's spin-(d-1)/2 coherent-state map (arXiv:1605.05775 Eq. 8):
        # phi_k = sqrt(C(d-1, k-1)) cos(pi x/2)^(d-k) sin(pi x/2)^(k-1).
        # Reduces exactly to 'normal' at d=2; |phi| = 1 for every x.
        from math import comb

        c = np.cos(np.pi / 2.0 * x)
        sn = np.sin(np.pi / 2.0 * x)
        out = np.stack(
            [np.sqrt(float(comb(d - 1, k - 1))) * c ** (d - k) * sn ** (k - 1)
             for k in range(1, d + 1)], axis=-1)
    elif feature == FEATURE_SERIES:
        powers = np.arange(d, dtype=np.float64)
        out = (x[..., None] / 4.0) ** powers
    else:
        raise ValueError(
            f"feature type {feature!r} not recognized (normal|spin|series)")
    return out.astype(np.float32)


def featurize(images: np.ndarray, feature: str = FEATURE_NORMAL, d: int = 2,
              rescale: float = REFERENCE_RESCALE) -> np.ndarray:
    """Dataset images [B, N] in [0,1] -> feature array X [B, N, d] float32."""
    return phi(images, feature=feature, d=d, rescale=rescale)
