"""Shared app plumbing: input-file handling, dataset loading, feature mapping.

Every app takes exactly one argument — the input file — like the reference programs
(fixedL.cc:579-584).  Parameter names and defaults follow README.md:65-79 and the
per-app getInt/getReal calls.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

from tnml_tpu.config import Config, read_input_file
from tnml_tpu.data.mnist import TEST, TRAIN, read_mnist
from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.ops.feature import REFERENCE_RESCALE, featurize

DEFAULT_DATADIR = "/root/reference/mllib/MNIST"


def load_config(argv) -> Config:
    if len(argv) != 2:
        print(f"Usage: {argv[0]} inputfile")
        sys.exit(0)
    from tnml_tpu.utils.cache import enable_compilation_cache
    from tnml_tpu.utils.platform import honor_jax_platforms_env
    from tnml_tpu.utils.precision import configure_matmul_precision
    honor_jax_platforms_env()   # JAX_PLATFORMS=cpu must really mean cpu
    enable_compilation_cache()
    configure_matmul_precision()
    return read_input_file(argv[1])


def rescale_from(cfg: Config) -> float:
    """'reference' keeps the double-/255 quirk (default); 'fixed' feeds phi the
    true [0,1] pixel; a number scales pixels by that factor before phi.

    The double-/255 is load-bearing, not just a quirk: it keeps every site's
    feature vector near (1, eps) so the 784-site product state stays
    well-conditioned — with true [0,1] pixels the cos/sin map's training
    gradient vanishes at this chain length (the reference README's own
    caveat).  Intermediate values trade signal strength against that
    conditioning."""
    mode = cfg.get_string("rescale", "reference")
    if mode == "reference":
        return REFERENCE_RESCALE
    if mode == "fixed":
        return 1.0
    try:
        return float(mode)
    except ValueError:
        raise ValueError(
            f"rescale={mode!r} not recognized (reference|fixed|<float>)")


def load_features(cfg: Config, split: str, feature: str,
                  nt: Optional[int] = None, d: int = 2
                  ) -> Tuple[np.ndarray, np.ndarray]:
    datadir = cfg.get_string("datadir", DEFAULT_DATADIR)
    if nt is None:
        nt = cfg.get_int("Ntrain", 60000)
    rescale = rescale_from(cfg)
    imglen = cfg.get_int("imglen", 0)   # 0 = native size; else resize (image.h parity)

    # native fast path: fused IDX -> features in one pass (native/tnml_native.cc)
    if imglen == 0 and cfg.get_yesno("native_loader", True):
        from tnml_tpu.data.mnist import _FILES, _find
        from tnml_tpu.io import native
        img_name, lbl_name = _FILES[split]
        img = _find(datadir, img_name) if datadir else None
        lbl = _find(datadir, lbl_name) if datadir else None
        if (img and lbl and not img.endswith(".gz") and not lbl.endswith(".gz")
                and feature in ("normal", "series") and native.available()):
            X, labels = native.load_features(img, lbl, nt, feature, d, rescale)
            print(f"[tnml] {split}: {X.shape[0]} images (native IDX loader)")
            return X, labels

    ds = read_mnist(datadir, split, nt=nt)
    images = ds.images
    if imglen and imglen != ds.height:
        from tnml_tpu.data.image import resize
        sq = images.reshape(-1, ds.height, ds.width)
        images = np.stack([resize(im, imglen) for im in sq])
        images = images.reshape(images.shape[0], imglen * imglen)
    X = featurize(images, feature=feature, d=d, rescale=rescale)
    return X, ds.labels


def ensure_sites(workdir: str, n: int, d: int) -> None:
    """Read-or-create the shared `sites` artifact (fixedL.cc:618-632)."""
    path = os.path.join(workdir, ckpt.SITES_FILE)
    if os.path.exists(path):
        meta = ckpt.read_sites(path)
        if meta["d"] != d:
            raise SystemExit(f"Error: d={d} but dimension of sites file is {meta['d']}")
        if meta["N"] != n:
            raise SystemExit(f"Error: N={n} but sites file has N={meta['N']}")
    else:
        ckpt.write_sites(path, n, d)


def require_sites(workdir: str) -> dict:
    path = os.path.join(workdir, ckpt.SITES_FILE)
    if not os.path.exists(path):
        raise SystemExit("Couldn't find file 'sites'")
    return ckpt.read_sites(path)
