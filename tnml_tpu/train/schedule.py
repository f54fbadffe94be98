"""Per-sweep (maxm, minm, cutoff, noise) schedule — the ITensor ``Sweeps`` analog.

The reference builds ``Sweeps(Nsweep, minm, maxm, cutoff)`` with constant values
across sweeps (fixedL.cc:749) and per-accessor assignment in `single`
(single.cc:218-222); this class supports both plus ramped schedules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Union

import numpy as np


@dataclass
class Sweeps:
    nsweep: int
    maxm: np.ndarray
    minm: np.ndarray
    cutoff: np.ndarray
    noise: np.ndarray

    @classmethod
    def constant(cls, nsweep: int, minm: int, maxm: int, cutoff: float,
                 noise: float = 0.0) -> "Sweeps":
        return cls(nsweep,
                   np.full(nsweep, maxm, dtype=np.int64),
                   np.full(nsweep, minm, dtype=np.int64),
                   np.full(nsweep, cutoff, dtype=np.float64),
                   np.full(nsweep, noise, dtype=np.float64))

    @classmethod
    def ramped(cls, nsweep: int, minm: int, maxms: Sequence[int], cutoff: float,
               noise: float = 0.0) -> "Sweeps":
        """Ramp maxm over the first len(maxms) sweeps, then hold the last value."""
        ms = list(maxms) + [maxms[-1]] * max(0, nsweep - len(maxms))
        return cls(nsweep,
                   np.asarray(ms[:nsweep], dtype=np.int64),
                   np.full(nsweep, minm, dtype=np.int64),
                   np.full(nsweep, cutoff, dtype=np.float64),
                   np.full(nsweep, noise, dtype=np.float64))

    def pad_dim(self) -> int:
        """Static padded bond dimension covering the whole schedule."""
        return int(self.maxm.max())


def sweep_bonds(n_sites: int):
    """Bond visit order of one sweep, 0-indexed: the ITensor ``sweepnext`` pattern
    (fixedL.cc:478) — bonds 0..N-2 rightward (dir=+1), then N-2..0 leftward (dir=-1);
    bond N-2 is visited twice in a row at the turn."""
    for b in range(n_sites - 1):
        yield b, +1
    for b in range(n_sites - 2, -1, -1):
        yield b, -1
