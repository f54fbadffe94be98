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


def estimate_hbm(batch: int, n_sites: int, pad: int, *, d: int = 2,
                 n_labels: int = 10, env_bytes: int = 2, n_chips: int = 1,
                 label_mode: str = "moving") -> dict:
    """Per-chip HBM model (bytes) of the scan-fused training state.

    The dominant buffers, per chip with the batch sharded dp over ``n_chips``:
    - wing stack:    (N-1) * (B/chips) * pad * env_bytes    (moving: one stack,
      label-free; fixed: a plain stack + the 10x labeled stack of ~N/2 rows)
    - feature array: N * d * (B/chips) * 4
    - cores:         N * pad * d * pad * 4 (+ label core *n_labels), replicated
    - CG working set: ~3 bond tensors + Lphi/Rphi products ~ 2*(B/chips)*K*pad*d*4

    This is the sizing rule behind BASELINE.md's pod-scale row: full MNIST
    (B=58,862, N=784, m=120, bf16 wings) on a v5e-8 runs the moving mode at
    ~1.4 GB/chip of wing stack — and even the labeled fixed-mode stack fits
    (~6.9 GB/chip).
    """
    bpc = (batch + n_chips - 1) // n_chips
    wings_plain = (n_sites - 1) * bpc * pad * env_bytes
    out = {
        "features": n_sites * d * bpc * 4,
        "cores": n_sites * pad * d * pad * 4 + pad * d * pad * n_labels * 4,
        "cg_work": 2 * bpc * n_labels * pad * d * 4 + 3 * pad * d * d * pad * n_labels * 4,
    }
    if label_mode == "moving":
        out["wings"] = wings_plain
    else:
        # fixed layout: delegate to the single sizing model (train/memmodel.py)
        from tnml_tpu.train.memmodel import fixed_layout_bytes
        out["wings"] = fixed_layout_bytes(bpc, pad, n_labels, n_sites // 2,
                                          n_sites, env_bytes)["total"]
    out["total"] = sum(out.values())
    return out


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
