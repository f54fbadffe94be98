"""Multi-host (multi-process) data parallelism over DCN.

The reference has no multi-node story at all (SURVEY.md §2 component 6: a single
process, <=16 ``std::async`` threads).  The TPU-native design scales past one host
with the SAME engine code path: ``jax.distributed`` initializes the cross-process
runtime, the mesh spans every process's devices, and the batch axis is sharded
globally — each process holds only its local shard of the feature/target arrays
(``jax.make_array_from_process_local_data``), and the CG reductions that are ICI
psums within a host become DCN allreduces across hosts, inserted by GSPMD exactly
as in the single-host case (SURVEY.md §5 "multi-host via jax distributed arrays —
same code path").

Smoke-tested in ``tests/test_distributed.py`` by spawning real multi-process CPU
workers (2 processes x 2 devices) and checking a sharded engine reduction against
the single-process result.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the cross-process JAX runtime (idempotent).

    On Cloud TPU pods the three arguments auto-detect from the environment;
    elsewhere (CPU/GPU clusters, tests) pass them explicitly.  After this,
    ``jax.devices()`` spans every process and meshes built from it are global.
    """
    if getattr(initialize, "_done", False):
        return
    # NOTE: must run before ANY backend-initializing jax call (jax.devices(),
    # device_put, ...) — so no jax.process_count() probe here
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    initialize._done = True


def global_data_parallel(axis: str = "dp"):
    """A DataParallel policy over ALL processes' devices (DCN + ICI)."""
    from tnml_tpu.parallel.mesh import DataParallel, make_mesh

    return DataParallel(make_mesh(axis=axis))


def shard_host_batch(sharding, arr: np.ndarray, batch_axis: int = 0):
    """Assemble a GLOBAL batch-sharded array from per-process local rows.

    ``arr`` is this process's slice (row-partitioned in process order); the
    returned jax.Array has global shape ``process_count * local`` rows on the
    batch axis and the engine's usual ``NamedSharding`` — exactly what
    ``SweepEngine(..., sharding=...)`` produces single-host, so everything
    downstream (wing builds, CG psums, bond splits) is the same program.
    """
    import jax

    ns = sharding.for_batch_axis(arr.ndim, batch_axis)
    global_shape = list(arr.shape)
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(ns, arr, tuple(global_shape))


def process_local_rows(n_global: int, batch_axis_chunks: Optional[int] = None):
    """(start, stop) of this process's contiguous row range of a global batch.

    The global batch must divide ``jax.process_count()`` (pad with
    ``DataParallel.pad_dataset`` first — pad rows are numerically inert).
    """
    import jax

    pc, pid = jax.process_count(), jax.process_index()
    if n_global % pc:
        raise ValueError(f"global batch {n_global} must divide process count {pc}")
    per = n_global // pc
    return pid * per, (pid + 1) * per
