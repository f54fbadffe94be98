import numpy as np
import pytest

from tnml_tpu.mps.core import MPS, svd_truncate
from tnml_tpu.mps.ops import (embed_linear, evaluate_mps, mps_add, mps_sum, overlap,
                              product_state)
from tnml_tpu.ops.feature import FEATURE_SERIES, phi

rng = np.random.default_rng(42)


def random_mps(n=6, d=2, m=4, label_site=None, L=10):
    cores = []
    dims = [1] + [m] * (n - 1) + [1]
    for j in range(n):
        shape = (dims[j], d, dims[j + 1])
        if j == label_site:
            shape = shape + (L,)
        cores.append(rng.normal(size=shape) * 0.5)
    return MPS(cores, label_site=label_site)


def dense_vector(psi: MPS) -> np.ndarray:
    """Contract an MPS to its full dense tensor (flattened), label axis last."""
    v = np.ones((1, 1))  # [phys_flat, bond]
    lab = None
    for j, c in enumerate(psi.cores):
        if j == psi.label_site:
            ml, d, mr, L = c.shape
            out = np.einsum("xa,adrl->xdrl", v.reshape(-1, ml), c)
            lab = L
            v = out.transpose(0, 1, 3, 2).reshape(-1, mr)  # fold label into phys
        else:
            v = np.einsum("xa,adr->xdr", v.reshape(-1, c.shape[0]), c).reshape(-1, c.shape[2])
    return v.reshape(-1)


# ---- svd_truncate semantics -------------------------------------------------

def test_svd_truncate_exact():
    M = rng.normal(size=(6, 8))
    U, s, Vt, err = svd_truncate(M)
    np.testing.assert_allclose(U * s @ Vt, M, atol=1e-12)
    assert err == 0.0


def test_svd_truncate_cutoff_semantics():
    s_true = np.array([1.0, 0.5, 1e-4, 1e-8])
    M = np.diag(s_true)
    # cutoff on squared singular values, relative: keep while tail/total <= cutoff
    # keeps the SMALLEST rank whose discarded tail of s^2 stays within cutoff*total
    U, s, Vt, err = svd_truncate(M, cutoff=1e-9)
    assert len(s) == 3  # dropping 1e-4 too would give tail 8e-9 > 1e-9
    U, s, Vt, err = svd_truncate(M, cutoff=1e-2)
    assert len(s) == 2
    assert err == pytest.approx((1e-4**2 + 1e-8**2) / (s_true**2).sum())


def test_svd_truncate_minm_maxm():
    M = np.diag([1.0, 1e-9, 1e-12, 1e-14])
    U, s, Vt, _ = svd_truncate(M, cutoff=1e-3, minm=3)
    assert len(s) == 3  # minm floor wins over cutoff
    U, s, Vt, _ = svd_truncate(M, cutoff=0.0, maxm=2)
    assert len(s) == 2  # maxm cap wins over cutoff


# ---- MPS algebra ------------------------------------------------------------

def test_product_state_and_overlap():
    feats = rng.normal(size=(5, 2))
    psi = product_state(feats)
    expect = np.prod([f @ f for f in feats])
    assert overlap(psi, psi) == pytest.approx(expect)


def test_add_is_sum_of_dense_vectors():
    a, b = random_mps(), random_mps()
    s = mps_add(a, b)
    np.testing.assert_allclose(dense_vector(s), dense_vector(a) + dense_vector(b),
                               atol=1e-10)


def test_add_with_label_axis():
    a = random_mps(label_site=3)
    b = random_mps(label_site=3)
    s = mps_add(a, b)
    np.testing.assert_allclose(dense_vector(s), dense_vector(a) + dense_vector(b),
                               atol=1e-10)


def test_compress_preserves_state():
    a = random_mps(n=7, m=5)
    dense = dense_vector(a)
    b = a.copy()
    err = b.compress(cutoff=1e-14)
    np.testing.assert_allclose(dense_vector(b), dense, atol=1e-8)
    assert err <= 1e-12
    # compressed bond dims can't exceed the entanglement-allowed growth
    assert b.max_bond() <= a.max_bond()


def test_compress_truncates_to_maxm():
    terms = [random_mps(n=6, m=3) for _ in range(8)]
    s = mps_sum(terms, cutoff=1e-10, maxm=5)
    assert s.max_bond() <= 5


def test_mps_sum_matches_dense_sum():
    terms = [random_mps(n=5, m=2) for _ in range(5)]
    s = mps_sum(terms, cutoff=1e-14, maxm=64)
    np.testing.assert_allclose(dense_vector(s),
                               sum(dense_vector(t) for t in terms), atol=1e-8)


def test_compress_label_mps_preserves_state():
    a = random_mps(n=6, m=4, label_site=3)
    dense = dense_vector(a)
    a.compress(cutoff=1e-14)
    np.testing.assert_allclose(dense_vector(a), dense, atol=1e-8)


def test_attach_label_and_open_overlap():
    feats = rng.normal(size=(5, 2))
    psi = product_state(feats)
    psi.attach_label(site=2, label=7, n_labels=10)
    img = product_state(feats)
    out = overlap(psi, img, open_label=True)
    assert out.shape == (10,)
    full = np.prod([f @ f for f in feats])
    assert out[7] == pytest.approx(full)
    np.testing.assert_allclose(np.delete(out, 7), 0.0, atol=1e-12)


# ---- linear embedding (linear.cc:205-236) ------------------------------------

def test_embed_linear_exact():
    n = 9
    w = rng.normal(size=n)
    bias = 0.37
    psi = embed_linear(w, bias, n)
    for _ in range(5):
        x = rng.uniform(size=n)
        feats = phi(x, FEATURE_SERIES, d=2, rescale=1.0)
        f_mps = evaluate_mps(psi, feats)
        f_lin = bias + float(w @ (x / 4.0))
        assert f_mps == pytest.approx(f_lin, rel=1e-6)
    # and it compresses without loss (it is exactly bond dimension 2)
    dense_before = evaluate_mps(psi, phi(np.ones(n) * 0.5, FEATURE_SERIES, 2, rescale=1.0))
    psi.compress(cutoff=1e-14)
    assert psi.max_bond() <= 2
    dense_after = evaluate_mps(psi, phi(np.ones(n) * 0.5, FEATURE_SERIES, 2, rescale=1.0))
    assert dense_after == pytest.approx(dense_before, rel=1e-6)
