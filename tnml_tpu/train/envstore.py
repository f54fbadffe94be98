"""Environment stores: HBM-resident (default) or out-of-core wings.

The reference spools environment batches to disk (`proj_images/B%03dE%05d`,
fixedL.cc:115-157) because 60k images x bond-dim x 784 sites exceeds RAM.  The TPU
engine keeps wings in HBM; when they do not fit, ``OffloadEnvStore`` demotes wings
outside a hot window around the active bond to host memory (numpy) or to the native
file-backed spool (native/tnml_native.cc) — the ``Nbatch`` capability, re-homed.

Access pattern per bond b: read sites b-1 and b+2, write site b — the write is re-read
at bond b+1 and again in the opposite half-sweep, so a +-``keep``-site device window
captures all same-half reuse and everything else streams.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np


class DeviceEnvStore:
    """All wings stay on device (a site-indexed dict)."""

    def __init__(self):
        self._d: Dict[int, tuple] = {}

    def get(self, j: int):
        return self._d[j]

    def put(self, j: int, env) -> None:
        self._d[j] = env

    def __contains__(self, j: int) -> bool:
        return j in self._d

    def __len__(self) -> int:
        return len(self._d)

    def clear(self) -> None:
        self._d.clear()

    def sites(self):
        return self._d.keys()

    def items(self):
        return self._d.items()


class OffloadEnvStore(DeviceEnvStore):
    """Wings outside a +-keep window around the last write live on the host.

    ``spool_dir`` additionally pushes host copies through the native file spool
    (true out-of-core, bounded host RAM).
    """

    def __init__(self, keep: int = 3, spool_dir: Optional[str] = None):
        super().__init__()
        self.keep = keep
        self._host: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._spools: Dict[int, tuple] = {}   # slot_bytes -> (Spool, next_slot)
        self._spool_meta: Dict[int, tuple] = {}
        self._spool_dir = None
        if spool_dir is not None:
            from tnml_tpu.io import native
            if not native.available():
                raise RuntimeError("native spool requested but library unavailable")
            os.makedirs(spool_dir, exist_ok=True)
            self._spool_dir = spool_dir
            self._native = native

    def get(self, j: int):
        if j in self._d:
            return self._d[j]
        if j in self._host:
            arr, sig = self._host.pop(j)
            env = (jax.device_put(arr), jax.device_put(sig))
            self._d[j] = env
            return env
        if j in self._spool_meta:
            size_key, slot, shape, dtype, sshape = self._spool_meta.pop(j)
            spool, _ = self._spools[size_key]
            flat = spool.read(slot, np.empty(
                int(np.prod(shape)) + int(np.prod(sshape)), dtype=np.float32))
            n = int(np.prod(shape))
            arr = flat[:n].reshape(shape).astype(dtype)
            sig = flat[n:].reshape(sshape)
            env = (jax.device_put(arr), jax.device_put(sig))
            self._d[j] = env
            return env
        raise KeyError(j)

    def put(self, j: int, env) -> None:
        self._d[j] = env
        # demote device entries that left the hot window
        for k in [k for k in self._d if abs(k - j) > self.keep]:
            arr, sig = self._d.pop(k)
            host = (np.asarray(arr), np.asarray(sig))
            if self._spool_dir is not None:
                self._push_spool(k, host)
            else:
                self._host[k] = host

    def _push_spool(self, k: int, host) -> None:
        """Wings come in two sizes (labelled / plain); one spool file per size.

        Slots are keyed by SITE INDEX — the natural unique key — so recycling can
        never overwrite a slot that another live site still references (a monotonic
        counter mod n_slots could, once the chain outgrows the slot count)."""
        arr, sig = host
        flat = np.concatenate([arr.astype(np.float32).ravel(),
                               sig.astype(np.float32).ravel()])
        size_key = 4 * flat.size
        if size_key not in self._spools:
            n_slots = max(4096, k + 1)
            spool = self._native.Spool(
                os.path.join(self._spool_dir, f"wings.{size_key}.spool"),
                n_slots, size_key)
            self._spools[size_key] = (spool, 0)
        spool, _ = self._spools[size_key]
        if k >= spool.n_slots:
            raise RuntimeError(f"site index {k} exceeds spool slots {spool.n_slots}")
        spool.write(k, flat)
        self._spool_meta[k] = (size_key, k, arr.shape, arr.dtype, sig.shape)

    def __contains__(self, j: int) -> bool:
        return j in self._d or j in self._host or j in self._spool_meta

    def __len__(self) -> int:
        return len(self._d) + len(self._host) + len(self._spool_meta)

    def clear(self) -> None:
        super().clear()
        self._host.clear()
        self._spool_meta.clear()

    def sites(self):
        return (set(self._d) | set(self._host) | set(self._spool_meta))

    def device_resident(self) -> int:
        return len(self._d)
