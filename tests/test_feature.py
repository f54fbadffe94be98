import numpy as np
import pytest

from tnml_tpu.ops.feature import (REFERENCE_RESCALE, FEATURE_NORMAL, FEATURE_SERIES,
                                  featurize, phi)


def test_normal_map_values():
    x = np.array([0.0, 0.5, 1.0])
    out = phi(x, FEATURE_NORMAL, rescale=1.0)
    np.testing.assert_allclose(out[:, 0], np.cos(np.pi / 2 * x), rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], np.sin(np.pi / 2 * x), rtol=1e-6)
    # unit norm per pixel
    np.testing.assert_allclose((out ** 2).sum(-1), 1.0, rtol=1e-6)


def test_series_map_values():
    x = np.array([0.0, 0.4, 1.0])
    out = phi(x, FEATURE_SERIES, d=3, rescale=1.0)
    np.testing.assert_allclose(out[:, 0], 1.0)
    np.testing.assert_allclose(out[:, 1], x / 4.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, 2], (x / 4.0) ** 2, rtol=1e-6)


def test_reference_double_normalization_quirk():
    # With the default rescale, phi sees x in [0, 1/255] — fixedL.cc:637-642.
    out = phi(np.array([1.0]), FEATURE_SERIES, d=2)
    np.testing.assert_allclose(out[0, 1], (1.0 / 255.0) / 4.0, rtol=1e-6)
    assert REFERENCE_RESCALE == pytest.approx(1 / 255)


def test_guard_rejects_out_of_range():
    with pytest.raises(ValueError):
        phi(np.array([1.5]))
    with pytest.raises(ValueError):
        phi(np.array([-0.1]))


def test_featurize_shape():
    imgs = np.random.default_rng(0).uniform(size=(4, 9)).astype(np.float32)
    X = featurize(imgs, FEATURE_NORMAL)
    assert X.shape == (4, 9, 2) and X.dtype == np.float32


def test_spin_map_generalizes_normal():
    """'spin' is the paper's spin-(d-1)/2 coherent-state map (arXiv:1605.05775
    Eq. 8): unit-norm for every x, and exactly 'normal' at d=2."""
    import numpy as np
    from tnml_tpu.ops.feature import FEATURE_NORMAL, FEATURE_SPIN, phi

    x = np.linspace(0.0, 1.0, 11)
    np.testing.assert_allclose(phi(x, FEATURE_SPIN, d=2, rescale=1.0),
                               phi(x, FEATURE_NORMAL, d=2, rescale=1.0),
                               atol=1e-7)
    for d in (2, 3, 5):
        out = phi(x, FEATURE_SPIN, d=d, rescale=1.0)
        assert out.shape == (11, d)
        np.testing.assert_allclose((out ** 2).sum(-1), 1.0, atol=1e-6)
