"""MNIST-style dataset loader with reference parity.

Mirrors ``mllib::readMNIST`` (mllib/mnist.h:443-530):

- reads IDX image/label files from ``datadir`` (``train-images-idx3-ubyte`` /
  ``train-labels-idx1-ubyte`` and ``t10k-...``; ``.gz`` variants accepted),
- normalizes pixels to ``[0, 1]`` (mllib/mnist.h:495),
- caps the set at ``nt`` images **per label** (mllib/mnist.h:472-488, default 50000),
- reports per-label counts.

When image files are absent (this environment ships only label files), images are
synthesized deterministically per (split, index) — see ``tnml_tpu.data.synthetic`` —
conditioned on the real label stream when label files exist, so per-label counts and
ordering match the reference loader's behavior on real data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from tnml_tpu.io.idx import read_idx
from tnml_tpu.data import synthetic

TRAIN = "train"
TEST = "test"

_FILES = {
    TRAIN: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    TEST: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}
_DEFAULT_COUNT = {TRAIN: 60000, TEST: 10000}


@dataclass
class Dataset:
    """Loaded split: ``images`` float32 [B, H*W] in [0,1]; ``labels`` int32 [B]."""

    images: np.ndarray
    labels: np.ndarray
    height: int
    width: int
    synthetic: bool = False

    @property
    def n(self) -> int:
        return int(self.images.shape[0])

    @property
    def n_sites(self) -> int:
        return int(self.images.shape[1])

    def label_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=10)


def _find(datadir: str, name: str) -> Optional[str]:
    for cand in (name, name + ".gz", name.replace("-idx", ".idx"),
                 name.replace("-idx", ".idx") + ".gz"):
        path = os.path.join(datadir, cand)
        if os.path.exists(path):
            return path
    return None


def _cache_dir() -> str:
    d = os.environ.get("TNML_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "tnml_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _synth_images_cached(labels: np.ndarray, split: str, size: int) -> np.ndarray:
    # v2: images keyed to the crc32-seeded generator (synthetic._rng) — v1
    # caches were written under process-salted hash() seeds
    key = f"synth-{split}-{labels.shape[0]}-{size}-v2.npy"
    path = os.path.join(_cache_dir(), key)
    if os.path.exists(path):
        try:
            arr = np.load(path)
            if arr.shape == (labels.shape[0], size, size):
                return arr
        except Exception:
            pass
    arr = synthetic.synth_images(labels, split, size=size)
    tmp = path + f".tmp{os.getpid()}.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)
    return arr


def read_mnist(datadir: str,
               split: str = TRAIN,
               nt: int = 50000,
               size: int = 28,
               verbose: bool = True) -> Dataset:
    """Load a split with the reference loader's semantics (per-label cap ``nt``)."""
    if split not in _FILES:
        raise ValueError(f"split must be one of {sorted(_FILES)}, got {split!r}")
    img_name, lbl_name = _FILES[split]
    img_path = _find(datadir, img_name) if datadir else None
    lbl_path = _find(datadir, lbl_name) if datadir else None

    if lbl_path is not None:
        labels = read_idx(lbl_path).astype(np.int32)
    else:
        labels = synthetic.synth_labels(_DEFAULT_COUNT[split], split).astype(np.int32)

    is_synth = img_path is None
    if img_path is not None:
        raw = read_idx(img_path)
        if raw.ndim != 3:
            raise ValueError(f"{img_path}: expected rank-3 image file, got rank {raw.ndim}")
        if raw.shape[0] != labels.shape[0]:
            raise ValueError("image/label count mismatch")
        h, w = int(raw.shape[1]), int(raw.shape[2])
    else:
        raw = _synth_images_cached(labels, split, size)
        h = w = size
        if verbose:
            print(f"[tnml] no IDX image files under {datadir!r}; using deterministic "
                  f"synthetic digits ({labels.shape[0]} x {h}x{w})")

    # Per-label cap, preserving file order (mllib/mnist.h:472-488).
    counts = np.zeros(10, dtype=np.int64)
    keep = np.zeros(labels.shape[0], dtype=bool)
    for i, l in enumerate(labels):
        if counts[l] < nt:
            counts[l] += 1
            keep[i] = True
    raw = raw[keep]
    labels = labels[keep]

    images = (raw.reshape(raw.shape[0], h * w).astype(np.float32)) / 255.0
    if verbose:
        per = np.bincount(labels, minlength=10)
        print(f"[tnml] {split}: {labels.shape[0]} images "
              f"({'synthetic' if is_synth else 'IDX'}), per-label " +
              " ".join(str(int(c)) for c in per))
    return Dataset(images=images, labels=labels, height=h, width=w, synthetic=is_synth)
