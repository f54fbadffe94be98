import os

import numpy as np
import pytest

from tnml_tpu.io.idx import MAGIC_IMAGES, MAGIC_LABELS, expected_magic, read_idx, write_idx

REF_MNIST = "/root/reference/mllib/MNIST"


def test_roundtrip_ubyte_rank3(tmp_path):
    arr = (np.arange(2 * 4 * 3) % 251).astype(np.uint8).reshape(2, 4, 3)
    p = str(tmp_path / "imgs.idx")
    write_idx(p, arr)
    back = read_idx(p)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(arr, back)
    assert expected_magic(arr) == MAGIC_IMAGES


def test_roundtrip_rank1_and_gz(tmp_path):
    arr = np.array([3, 1, 4, 1, 5, 9], dtype=np.uint8)
    p = str(tmp_path / "lbl.idx.gz")
    write_idx(p, arr)
    np.testing.assert_array_equal(read_idx(p), arr)
    assert expected_magic(arr) == MAGIC_LABELS


def test_roundtrip_float(tmp_path):
    arr = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
    p = str(tmp_path / "f.idx")
    write_idx(p, arr)
    np.testing.assert_allclose(read_idx(p), arr)


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_MNIST, "train-labels-idx1-ubyte")),
                    reason="reference label files not present")
def test_reads_real_mnist_labels():
    labels = read_idx(os.path.join(REF_MNIST, "train-labels-idx1-ubyte"))
    assert labels.shape == (60000,)
    assert labels.min() >= 0 and labels.max() <= 9
    # Known MNIST per-label counts
    counts = np.bincount(labels, minlength=10)
    assert counts[1] == 6742 and counts[5] == 5421


def test_bad_magic(tmp_path):
    p = tmp_path / "bad"
    p.write_bytes(b"\x01\x02\x03\x04garbage")
    with pytest.raises(ValueError):
        read_idx(str(p))
