"""Device-mesh data parallelism over the training batch.

The reference's only parallel axis is images-within-batch, fanned out to <=16 pthreads
with per-thread accumulator slots and a serial reduction (paralleldo.h:21-68,
fixedL.cc:385).  The TPU-native equivalent: shard the batch axis of the feature and
environment arrays over a ``jax.sharding.Mesh`` and let SPMD partitioning turn every
contraction-over-batch (bond gradient, pAp, cost) into an XLA ``psum`` over ICI
(SURVEY.md §5 "Distributed communication backend").

Everything rides sharding propagation through ``jit``: arrays are placed with
``NamedSharding(P('dp', ...))`` and XLA inserts the collectives.  The batch axis must
divide the mesh size; callers pad the batch if needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, mp: int) -> Mesh:
    devs = jax.devices()[:dp * mp]
    return Mesh(np.asarray(devs).reshape(dp, mp), ("dp", "mp"))


@dataclass
class DataParallel:
    """Batch-axis sharding policy handed to the sweep engine."""

    mesh: Mesh
    axis: str = "dp"

    @property
    def n(self) -> int:
        return self.mesh.devices.size

    def for_batch_axis(self, ndim: int, batch_axis: int) -> NamedSharding:
        spec = [None] * ndim
        spec[batch_axis] = self.axis
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Smallest multiple of the mesh size >= n."""
        k = self.n
        return ((n + k - 1) // k) * k

    def pad_dataset(self, X: np.ndarray, labels: np.ndarray):
        """Pad (X, labels) so the batch divides the mesh size.

        Pad rows are all-zero features with label -1: a zero φ vector contributes
        exactly zero to every gradient/pAp/cost reduction (zero rows propagate
        zeros through the wing contractions), and one_hot(-1) is the zero target,
        so training numerics are bit-identical to the unpadded batch.  Only the
        printed /NT denominators dilute, by < mesh_size rows.
        """
        n = X.shape[0]
        m = self.pad_batch(n)
        if m == n:
            return X, labels
        Xp = np.zeros((m,) + X.shape[1:], dtype=X.dtype)
        Xp[:n] = X
        lp = np.full((m,), -1, dtype=labels.dtype)
        lp[:n] = labels
        return Xp, lp


@dataclass
class TwoAxisParallel(DataParallel):
    """dp x mp mesh: batch sharded on 'dp', MPS bond dimension sharded on 'mp'.

    The tensor-parallel analog for this model family: cores' right-bond axes are
    placed on 'mp' and sharding propagation turns the bond contractions into
    collectives over that axis.  Useful when maxm is large enough that the
    [pad, d, pad(, L)] cores and [B, pad] wings outgrow a single chip's share.
    """

    mesh: Mesh
    axis: str = "dp"

    def __post_init__(self):
        if "mp" not in self.mesh.axis_names:
            raise ValueError("TwoAxisParallel needs a mesh with a 'mp' axis")

    @property
    def n(self) -> int:
        return int(self.mesh.shape["dp"])

    def shard_core(self, core):
        spec = [None] * core.ndim
        spec[2] = "mp"          # right bond axis
        return jax.device_put(core, NamedSharding(self.mesh, P(*spec)))
