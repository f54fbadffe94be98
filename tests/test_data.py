import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tnml_tpu.data.mnist import TEST, TRAIN, read_mnist
from tnml_tpu.data.synthetic import render_digit, synth_images

REF_MNIST = "/root/reference/mllib/MNIST"


def test_render_deterministic():
    a = render_digit(7, "train", 123)
    b = render_digit(7, "train", 123)
    np.testing.assert_array_equal(a, b)
    c = render_digit(7, "train", 124)
    assert not np.array_equal(a, c)
    assert a.dtype == np.uint8 and a.shape == (28, 28)
    assert a.max() > 100  # glyph actually drawn


def test_classes_distinguishable():
    # Mean images of different digits should differ substantially.
    means = []
    for d in range(10):
        imgs = synth_images(np.full(50, d), "train")
        means.append(imgs.mean(axis=0))
    means = np.stack(means) / 255.0
    for i in range(10):
        for j in range(i + 1, 10):
            assert np.abs(means[i] - means[j]).mean() > 0.01, (i, j)


def test_read_mnist_cap_per_label():
    ds = read_mnist(REF_MNIST, TRAIN, nt=10, verbose=False)
    counts = ds.label_counts()
    assert (counts == 10).all()
    assert ds.n == 100
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert ds.n_sites == 784


def test_read_mnist_uses_real_labels_when_present():
    import os
    if not os.path.exists(os.path.join(REF_MNIST, "train-labels-idx1-ubyte")):
        return
    ds = read_mnist(REF_MNIST, TRAIN, nt=60000, verbose=False)
    counts = ds.label_counts()
    assert counts[1] == 6742  # real MNIST label stream
    assert ds.n == 60000


def test_read_mnist_test_split():
    ds = read_mnist(REF_MNIST, TEST, nt=50000, verbose=False)
    assert ds.n == 10000


def test_synthetic_stable_across_processes(tmp_path):
    """The synthetic fallback must be IDENTICAL in every process: its streams
    were once seeded via Python hash(), which is salt-randomized per process —
    combined with the image cache that silently re-labeled every cached image
    under the reader process's new label permutation (observed: a workdir
    whose cache was written by another process trained at chance accuracy)."""
    import subprocess
    import sys

    script = (
        "from tnml_tpu.data import synthetic; import numpy as np, zlib; "
        "l = synthetic.synth_labels(50, 'train'); "
        "im = synthetic.synth_images(l[:10], 'train', size=8); "
        "print(l.tolist()); print(zlib.crc32(im.tobytes()))"
    )
    outs = [subprocess.run([sys.executable, "-c", script], cwd=REPO,
                           capture_output=True, text=True, check=True).stdout
            for _ in range(2)]
    assert outs[0] == outs[1]
