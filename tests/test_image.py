"""Image utilities (reference image.h parity: resize, reduce, PNG export)."""

import zlib

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.data.image import reduce, resize, write_color, write_gray

rng = np.random.default_rng(3)


def test_resize_identity():
    img = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    np.testing.assert_array_equal(resize(img, 8), img)


def test_resize_pad_up_centers():
    img = np.full((4, 4), 200, dtype=np.uint8)
    out = resize(img, 8)
    assert out.shape == (8, 8)
    assert out[:2].sum() == 0 and out[2:6, 2:6].min() == 200


def test_resize_down_preserves_mean():
    img = rng.uniform(0, 255, size=(28, 28))
    out = resize(img, 7)
    assert out.shape == (7, 7)
    assert out.mean() == pytest.approx(img.mean(), rel=1e-9)


def test_resize_down_noninteger_ratio():
    img = rng.uniform(0, 255, size=(28, 28))
    out = resize(img, 10)
    assert out.shape == (10, 10)
    assert out.mean() == pytest.approx(img.mean(), rel=1e-9)


def test_reduce_block_average():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = reduce(img, 2)
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])
    with pytest.raises(ValueError):
        reduce(img, 3)


def _parse_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = np.frombuffer(data[16:24], dtype=">u4")
    # find IDAT
    idx = data.find(b"IDAT")
    size = int.from_bytes(data[idx - 4:idx], "big")
    raw = zlib.decompress(data[idx + 4:idx + 4 + size])
    return int(w), int(h), raw


def test_write_gray_png_roundtrip(tmp_path):
    img = rng.integers(0, 256, size=(5, 7)).astype(np.uint8)
    p = str(tmp_path / "g.png")
    write_gray(img, p)
    w, h, raw = _parse_png(p)
    assert (w, h) == (7, 5)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(5, 8)
    assert (rows[:, 0] == 0).all()           # filter byte 0 per row
    np.testing.assert_array_equal(rows[:, 1:], img)


def test_write_gray_accepts_unit_floats(tmp_path):
    img = rng.uniform(size=(4, 4)).astype(np.float32)
    p = str(tmp_path / "f.png")
    write_gray(img, p)
    w, h, raw = _parse_png(p)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(4, 5)[:, 1:]
    np.testing.assert_array_equal(rows, (img * 255).astype(np.uint8))


def test_write_color_png(tmp_path):
    img = rng.integers(0, 256, size=(3, 4, 3)).astype(np.uint8)
    p = str(tmp_path / "c.png")
    write_color(img, p)
    w, h, raw = _parse_png(p)
    assert (w, h) == (4, 3)


def test_imglen_resizes_in_apps(tmp_path, capsys):
    from tests.test_apps import run_in, write_input
    from tnml_tpu.apps import fixedL
    from tnml_tpu.data.synthetic import synth_images
    from tnml_tpu.io.idx import write_idx

    d = tmp_path / "data"
    d.mkdir()
    labels = np.tile(np.arange(10), 5)
    write_idx(str(d / "train-images-idx3-ubyte"),
              synth_images(labels, "train", size=12))
    write_idx(str(d / "train-labels-idx1-ubyte"), labels.astype(np.uint8))
    inp = write_input(tmp_path / "inp", datadir=str(d), Ntrain=5, maxm=6,
                      Nsweep=1, Npass=2, ninitial=2, imglen=8,
                      rescale="fixed", feature="normal")
    assert run_in(tmp_path, fixedL.main, inp) == 0
    out = capsys.readouterr().out
    assert "64 sites" in out     # 12x12 images resized to 8x8 = 64 sites
