"""Host-side MPS operations: product states, addition, tree summation, overlap,
linear-model embedding.

Reference parity:
- ``product_state``        <- makeMPS (util.h:76-102): bond-dim-1 MPS from per-pixel φ
- ``mps_add`` / ``mps_sum``<- ITensor ``sum(vector<MPS>, {Cutoff,Maxm})``
  (fixedL.cc:697,720-724; single.cc:120): direct-sum cores + compress, tree-reduced
  to avoid the O(n²) pairwise pile-up flagged in SURVEY.md §7
- ``overlap``              <- ITensor ``overlap`` (separate_fulltest.cc:38) and the
  open-label ``toverlap`` (util.h:19-40)
- ``embed_linear``         <- linear.cc:205-236: exact bond-dim-2 MPS with the same
  output as a linear model (the Novikov warm-start trick)
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from tnml_tpu.mps.core import MPS


def product_state(features: np.ndarray) -> MPS:
    """Bond-dimension-1 MPS from per-site feature vectors ``[N, d]`` (util.h:76-102)."""
    feats = np.asarray(features, dtype=np.float64)
    if feats.ndim != 2:
        raise ValueError("features must be [N, d]")
    cores = [f.reshape(1, -1, 1) for f in feats]
    return MPS(cores)


def mps_add(a: MPS, b: MPS) -> MPS:
    """Direct sum of two MPS (no compression): bond dims add, edges stay dim-1."""
    if a.n != b.n:
        raise ValueError("length mismatch")
    if a.label_site != b.label_site:
        raise ValueError("label site mismatch")
    n = a.n
    cores: List[np.ndarray] = []
    for j in range(n):
        ca, cb = a.cores[j], b.cores[j]
        la, da, ra = ca.shape[0], ca.shape[1], ca.shape[2]
        lb, rb = cb.shape[0], cb.shape[2]
        extra = ca.shape[3:]  # label axis if present
        if extra != cb.shape[3:]:
            raise ValueError("label dimension mismatch")
        # Edge cores keep bond dim 1 and are stacked, not direct-summed
        # (the MPS represents a sum of the two states).
        L = la + lb if j > 0 else 1
        R = ra + rb if j < n - 1 else 1
        out = np.zeros((L, da, R) + extra, dtype=np.result_type(ca, cb))
        out[:la, :, :ra] = ca
        out[L - lb:, :, R - rb:] = cb
        cores.append(out)
    return MPS(cores, a.label_site)


def mps_sum(terms: Sequence[MPS],
            cutoff: float = 0.0,
            maxm: int = 2**30,
            minm: int = 1) -> MPS:
    """Sum many MPS by tree reduction, compressing at each internal node."""
    if not terms:
        raise ValueError("empty sum")
    level = [t.copy() for t in terms]
    while len(level) > 1:
        nxt: List[MPS] = []
        for i in range(0, len(level) - 1, 2):
            s = mps_add(level[i], level[i + 1])
            s.compress(cutoff=cutoff, maxm=maxm, minm=minm)
            nxt.append(s)
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    out = level[0]
    if len(terms) == 1:
        out.compress(cutoff=cutoff, maxm=maxm, minm=minm)
    return out


def overlap(a: MPS, b: MPS, open_label: bool = False) -> np.ndarray:
    """<a|b>. Shared label axes are contracted (summed) unless ``open_label``.

    With ``open_label=True`` exactly one of the two MPS must carry a label axis;
    the result is the length-L vector of per-label overlaps — the evaluator's
    decision function (toverlap, util.h:19-40; used by fullTest util.h:123-200).
    """
    if a.n != b.n:
        raise ValueError("length mismatch")
    # E[ka, kb] transfer; an open label axis is carried as a leading axis.
    E = np.ones((1, 1, 1))  # [L_open, ma, mb]
    for j in range(a.n):
        ca, cb = a.cores[j], b.cores[j]
        if a.label_site == j and b.label_site == j and not open_label:
            E = np.einsum("xab,apcl,bpdl->xcd", E, ca, cb)
        elif a.label_site == j and b.label_site == j:
            raise ValueError("open_label requires exactly one labeled MPS")
        elif a.label_site == j:
            if open_label:
                Enew = np.einsum("xab,apcl,bpd->lxcd", E, ca, cb)
                E = Enew.reshape(-1, Enew.shape[2], Enew.shape[3])
            else:
                raise ValueError("labeled/unlabeled overlap needs open_label=True")
        elif b.label_site == j:
            if open_label:
                Enew = np.einsum("xab,apc,bpdl->lxcd", E, ca, cb)
                E = Enew.reshape(-1, Enew.shape[2], Enew.shape[3])
            else:
                raise ValueError("labeled/unlabeled overlap needs open_label=True")
        else:
            E = np.einsum("xab,apc,bpd->xcd", E, ca, cb)
    out = E.reshape(-1)
    if open_label:
        return out
    return out[0]


def embed_linear(weights: np.ndarray, bias: float, n_sites: int, d: int = 2) -> MPS:
    """Exact bond-dim-2 MPS reproducing a linear model's output (linear.cc:205-236).

    The model is ``f(x) = bias + sum_j weights[j] * phi_2(x_j)`` where the site basis
    is the 'series' map [1, x/4].  Core pattern per site (linear.cc:218-222)::

        A[0, 0, 0] = 1      (identity channel continues)
        A[1, 0, 1] = 1      (accumulator channel continues)
        A[1, 1, 0] = w_j    (site j contributes w_j * phi_2)

    with boundary vectors injecting the bias (linear.cc:224-229).
    """
    w = np.asarray(weights, dtype=np.float64)
    if w.shape != (n_sites,):
        raise ValueError("weights must have one entry per site")
    cores = []
    for j in range(n_sites):
        A = np.zeros((2, d, 2))
        A[0, 0, 0] = 1.0
        A[1, 0, 1] = 1.0
        A[1, 1, 0] = w[j]
        cores.append(A)
    # Left boundary row vector [bias, 1], right boundary column [1, 0].
    left = np.array([[bias, 1.0]])
    cores[0] = np.einsum("ab,bdc->adc", left, cores[0])
    cores[-1] = cores[-1][:, :, :1]
    return MPS(cores)


def evaluate_mps(psi: MPS, features: np.ndarray) -> np.ndarray:
    """Contract an MPS against one image's feature vectors [N, d].

    Returns a scalar (no label axis) or the [L] output vector (label axis open).
    """
    img = product_state(features)
    if psi.label_site is not None:
        return overlap(psi, img, open_label=True)
    return np.asarray(overlap(psi, img))
