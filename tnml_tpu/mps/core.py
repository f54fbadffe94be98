"""Host-side MPS container with exact (ragged) shapes.

This is the framework's "cold path": model initialization, summation/compression,
canonicalization, checkpointing, and ground truth for the device engine's tests run
here in float64 numpy.  The hot training path packs these cores into padded device
arrays (``tnml_tpu.mps.pack``) and runs batched XLA contractions.

Conventions:
- core ``j`` (0-indexed) has shape ``[m_left, d, m_right]``; edges have bond dim 1;
- an optional label axis lives on ONE core (the fixedL center, fixedL.cc:616,669-728),
  giving that core shape ``[m_left, d, m_right, L]``;
- ``svd_truncate`` reproduces ITensor's Cutoff/Maxm/Minm semantics (relative
  truncation-error goal on squared singular values; fixedL.cc:519-523, README.md:70-72).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


def svd_truncate(M: np.ndarray,
                 cutoff: float = 0.0,
                 maxm: int = 2**30,
                 minm: int = 1) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Truncated SVD with ITensor truncation semantics.

    Returns ``(U, s, Vt, truncerr)`` where ``truncerr`` is the discarded fraction of
    ``sum(s^2)`` (ITensor ``spec.truncerr()``, fixedL.cc:523).  Keeps the smallest rank
    ``r`` with tail error <= cutoff, clamped to ``[min(minm, len), min(maxm, len)]``.
    """
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    p = s.astype(np.float64) ** 2
    total = float(p.sum())
    n = len(s)
    if total <= 0.0:
        r = max(1, min(minm, n))
        return U[:, :r], s[:r], Vt[:r], 0.0
    # tail[r] = sum of p[r:], r = number kept
    tail = np.concatenate([np.cumsum(p[::-1])[::-1], [0.0]])  # len n+1
    ok = tail[1:] <= cutoff * total  # ok[r-1]: keeping r values meets the goal
    r = int(np.argmax(ok)) + 1 if ok.any() else n
    r = max(r, min(minm, n))
    r = min(r, maxm, n)
    truncerr = float(tail[r] / total)
    return U[:, :r], s[:r], Vt[:r], truncerr


@dataclass
class MPS:
    """Open-boundary MPS; optionally one core carries a label axis."""

    cores: List[np.ndarray]
    label_site: Optional[int] = None  # index of the core with the trailing label axis

    def __post_init__(self):
        for j, c in enumerate(self.cores):
            want = 4 if j == self.label_site else 3
            if c.ndim != want:
                raise ValueError(f"core {j}: expected rank {want}, got {c.ndim}")

    @property
    def n(self) -> int:
        return len(self.cores)

    @property
    def d(self) -> int:
        return int(self.cores[0].shape[1])

    @property
    def n_labels(self) -> int:
        if self.label_site is None:
            return 0
        return int(self.cores[self.label_site].shape[-1])

    def bond_dims(self) -> List[int]:
        """Bond dimensions [m_0, ..., m_N] including the trivial edges."""
        return [int(self.cores[0].shape[0])] + [int(c.shape[2]) for c in self.cores]

    def max_bond(self) -> int:
        return max(self.bond_dims())

    def copy(self) -> "MPS":
        return MPS([c.copy() for c in self.cores], self.label_site)

    # -- gauge/compression ---------------------------------------------------

    def _merge_phys(self, j: int) -> Tuple[np.ndarray, Tuple[int, ...]]:
        """View core j as [m_l, P, m_r] with the label axis folded into P."""
        c = self.cores[j]
        if j == self.label_site:
            ml, d, mr, L = c.shape
            return c.transpose(0, 1, 3, 2).reshape(ml, d * L, mr), (d, L)
        return c, (c.shape[1],)

    def _unmerge_phys(self, j: int, m: np.ndarray, phys: Tuple[int, ...]) -> np.ndarray:
        if len(phys) == 2:
            d, L = phys
            ml, _, mr = m.shape
            return m.reshape(ml, d, L, mr).transpose(0, 1, 3, 2)
        return m

    def left_canonicalize(self) -> None:
        """QR sweep 0..N-2: every core but the last becomes a left isometry."""
        for j in range(self.n - 1):
            m, phys = self._merge_phys(j)
            ml, P, mr = m.shape
            q, r = np.linalg.qr(m.reshape(ml * P, mr))
            k = q.shape[1]
            self.cores[j] = self._unmerge_phys(j, q.reshape(ml, P, k), phys)
            nxt, nphys = self._merge_phys(j + 1)
            self.cores[j + 1] = self._unmerge_phys(j + 1, np.einsum("ab,bpc->apc", r, nxt), nphys)

    def compress(self, cutoff: float = 0.0, maxm: int = 2**30, minm: int = 1) -> float:
        """Left-canonicalize, then truncate right-to-left. Returns max truncerr.

        Leaves the MPS right-canonical with the orthogonality center at core 0
        (the analog of ITensor ``orthogonalize``/``position(1)``, single.cc:121-124).
        """
        self.left_canonicalize()
        worst = 0.0
        for j in range(self.n - 1, 0, -1):
            m, phys = self._merge_phys(j)
            ml, P, mr = m.shape
            U, s, Vt, err = svd_truncate(m.reshape(ml, P * mr), cutoff, maxm, minm)
            worst = max(worst, err)
            r = len(s)
            self.cores[j] = self._unmerge_phys(j, Vt.reshape(r, P, mr), phys)
            prev, pphys = self._merge_phys(j - 1)
            US = U * s[None, :]
            self.cores[j - 1] = self._unmerge_phys(
                j - 1, np.einsum("apb,br->apr", prev, US), pphys)
        return worst

    def norm(self) -> float:
        """sqrt(<psi|psi>) (label axis, if any, summed like a site axis)."""
        from tnml_tpu.mps.ops import overlap
        return float(np.sqrt(overlap(self, self)))

    def scale(self, factor: float, site: int = 0) -> None:
        self.cores[site] = self.cores[site] * factor

    def move_label(self, target: int, cutoff: float = 0.0, maxm: int = 2**30) -> None:
        """Gauge-transport the label axis to another core (the reference's dormant
        ``movePos``, util.h:202-244, realized).

        Used by the moving-label training mode, where the label rides with the active
        bond so every environment wing stays label-free — the memory-critical layout
        for large-batch TPU runs (a fixed label makes half the wings 10x wider).
        """
        if self.label_site is None:
            raise ValueError("MPS has no label axis")
        while self.label_site != target:
            p = self.label_site
            step = 1 if target > p else -1
            q = p + step
            cp, cq = self.cores[p], self.cores[q]
            if step > 0:
                # T[a, s, L, t, r] -> rows (a,s), label goes right
                T = np.einsum("asml,mtr->astrl", cp, cq)
                a, s, t, r, L = T.shape
                U, sv, Vt, _ = svd_truncate(T.reshape(a * s, t * r * L),
                                            cutoff, maxm, 1)
                k = len(sv)
                self.cores[p] = U.reshape(a, s, k)
                self.cores[q] = (sv[:, None] * Vt).reshape(k, t, r, L)
            else:
                T = np.einsum("atm,msrl->atsrl", cq, cp)  # q left of p
                a, t, s, r, L = T.shape
                M = T.transpose(0, 1, 4, 2, 3).reshape(a * t * L, s * r)
                U, sv, Vt, _ = svd_truncate(M, cutoff, maxm, 1)
                k = len(sv)
                self.cores[q] = U.reshape(a, t, L, k).transpose(0, 1, 3, 2)
                self.cores[p] = (sv[:, None] * Vt).reshape(k, s, r)
            self.label_site = q

    def attach_label(self, site: int, label: int, n_labels: int = 10) -> None:
        """Tensor a label basis vector onto core ``site`` (fixedL.cc:693,721)."""
        if self.label_site is not None:
            raise ValueError("MPS already has a label axis")
        e = np.zeros(n_labels, dtype=self.cores[site].dtype)
        e[label] = 1.0
        self.cores[site] = self.cores[site][..., None] * e
        self.label_site = site
