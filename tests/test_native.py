"""Native runtime library (native/tnml_native.cc) vs the pure-Python path."""

import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.data.mnist import read_mnist
from tnml_tpu.data.synthetic import synth_images
from tnml_tpu.io import native
from tnml_tpu.io.idx import write_idx
from tnml_tpu.ops.feature import featurize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no compiler)")


@pytest.fixture()
def idx_dir(tmp_path):
    labels = np.tile(np.arange(10), 20)
    imgs = synth_images(labels, "train", size=8)
    write_idx(str(tmp_path / "train-images-idx3-ubyte"), imgs)
    write_idx(str(tmp_path / "train-labels-idx1-ubyte"), labels.astype(np.uint8))
    return str(tmp_path)


@pytest.mark.parametrize("feature,rescale", [("normal", 1.0), ("series", 1 / 255),
                                             ("series", 1.0)])
def test_native_matches_python(idx_dir, feature, rescale):
    Xn, ln = native.load_features(os.path.join(idx_dir, "train-images-idx3-ubyte"),
                                  os.path.join(idx_dir, "train-labels-idx1-ubyte"),
                                  6, feature, 2, rescale)
    ds = read_mnist(idx_dir, "train", nt=6, verbose=False)
    Xp = featurize(ds.images, feature, d=2, rescale=rescale)
    np.testing.assert_array_equal(ln, ds.labels)
    np.testing.assert_allclose(Xn, Xp, atol=1e-6)


def test_native_header(idx_dir):
    dims = native.idx_header(os.path.join(idx_dir, "train-images-idx3-ubyte"))
    assert dims == (200, 8, 8)


def test_native_series_d3(idx_dir):
    Xn, _ = native.load_features(os.path.join(idx_dir, "train-images-idx3-ubyte"),
                                 os.path.join(idx_dir, "train-labels-idx1-ubyte"),
                                 3, "series", 3, 1.0)
    assert Xn.shape[2] == 3
    np.testing.assert_allclose(Xn[:, :, 0], 1.0)
    np.testing.assert_allclose(Xn[:, :, 2], Xn[:, :, 1] ** 2, atol=1e-7)


def test_spool_roundtrip(tmp_path):
    sp = native.Spool(str(tmp_path / "spool.bin"), n_slots=8, slot_bytes=4096)
    rng = np.random.default_rng(0)
    arrs = [rng.normal(size=(32, 16)).astype(np.float32) for _ in range(8)]
    for i, a in enumerate(arrs):
        sp.write(i, a)
    # read back out of order
    for i in (5, 0, 7, 3):
        np.testing.assert_array_equal(sp.read(i, arrs[i]), arrs[i])
    # overwrite a slot
    sp.write(3, arrs[0])
    np.testing.assert_array_equal(sp.read(3, arrs[0]), arrs[0])
    with pytest.raises(OSError):
        sp.write(99, arrs[0])
    sp.close()


def test_bad_header(tmp_path):
    p = tmp_path / "junk"
    p.write_bytes(b"\x01\x02\x03\x04aaaa")
    with pytest.raises(ValueError):
        native.idx_header(str(p))
