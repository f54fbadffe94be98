"""linear: dense one-vs-rest linear classifier + exact MPS embedding
(reference: linear.cc).

Trains ``f(x) = V · [1, phi2(x_1), ..., phi2(x_N)]`` with targets y = ±1
(linear.cc:132) by conjugate gradient on the NT-normalized least squares
(linear.cc:27-90 — note: unlike fixedL's cgrad, the gradient IS divided by NT),
then embeds the model exactly as a bond-dimension-2 MPS ``W<label>``
(linear.cc:205-236) — the Novikov warm start for fixedL's merge init path.

phi here takes the RAW [0,1] pixel (no second /255 — linear.cc:118-122 is the one
app without the double-normalization quirk).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np

from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.ops import embed_linear


def linear_cgrad(V: np.ndarray, Xf: np.ndarray, y: np.ndarray, *,
                 npass: int, lam: float = 0.0,
                 stop_check: Optional[Callable[[], bool]] = None,
                 verbose: bool = True) -> Tuple[np.ndarray, float]:
    """CG on the dense design matrix (linear.cc:27-90); returns (V, final cost).

    Replicates the reference update exactly, including its quirks: pAp adds
    ``lambda*(W·W)`` — the current weights, not p (linear.cc:58).
    """
    nt = Xf.shape[0]
    r = Xf.T @ (y - Xf @ V) / nt
    if lam != 0.0:
        r = r - lam * V
    p = r.copy()
    C = 0.0
    for i in range(1, npass + 1):
        pv = Xf @ p
        pAp = float(pv @ pv) / nt + lam * float(V @ V)
        a = float(r @ r) / pAp
        V = V + a * p
        dW = y - Xf @ V
        nr = Xf.T @ dW / nt
        C = float(dW @ dW) / nt
        if lam != 0.0:
            nr = nr - lam * V
        beta = float(nr @ nr) / float(r @ r)
        r = nr
        C += lam * float(V @ V)
        if verbose:
            print(f"  {i} C = {C:.10f}")
        if stop_check is not None and stop_check():
            print("Found file STOP, exiting")
            return V, C
        p = r + beta * p
    return V, C


def linear_features(images: np.ndarray) -> np.ndarray:
    """[B, N] raw [0,1] pixels -> [B, 1+N] design rows [1, x/4, ...]
    (linear.cc:118-141)."""
    nb, n = images.shape
    out = np.empty((nb, 1 + n), dtype=np.float64)
    out[:, 0] = 1.0
    out[:, 1:] = images / 4.0
    return out


def evaluate_linear(V: np.ndarray, Xf: np.ndarray, y: np.ndarray, lam: float,
                    verbose: bool = True) -> float:
    """Sign-agreement accuracy + cost report (linear.cc:168-189)."""
    f = Xf @ V
    ncor = int(((f * y) > 0).sum())
    nt = len(y)
    cnl = float(((f - y) ** 2).sum()) / nt
    cl = lam * float(V @ V)
    if verbose:
        print(f"Percent correct = {ncor * 100.0 / nt:.4f}%, "
              f"#correct = {ncor}/{nt}, #incorrect = {nt - ncor}/{nt}")
        print(f"C (= {cnl:.10f} + {cl:.10f}) = {cnl + cl:.10f}")
    return ncor / nt


def linear_to_mps(V: np.ndarray, n_sites: int) -> MPS:
    """Exact bond-dim-2 embedding: W(x) = V0 + sum_j V_j * (x_j/4)
    (linear.cc:205-236)."""
    return embed_linear(V[1:], float(V[0]), n_sites)
