"""Environment stores: HBM-resident (default) or out-of-core wings.

The reference spools environment batches to disk (`proj_images/B%03dE%05d`,
fixedL.cc:115-157) because 60k images x bond-dim x 784 sites exceeds RAM.  The TPU
engine keeps wings in HBM; when they do not fit, ``OffloadEnvStore`` demotes wings
outside a hot window around the active bond to host memory (numpy) or to the native
file-backed spool (native/tnml_native.cc) — the ``Nbatch`` capability, re-homed.

Access pattern per bond b: read sites b-1 and b+2, write site b — the write is re-read
at bond b+1 and again in the opposite half-sweep, so a +-``keep``-site device window
captures all same-half reuse and everything else streams.

Demotions are deferred by a small pending window: a wing demoted at bond b
but re-read shortly after is served from the still-resident device buffer
instead of paying a demote+promote round trip.  Two measured non-features on
this environment's remote-TPU tunnel, kept out deliberately: speculative
``device_put`` prefetch (every transfer there is a synchronous ~40-80 ms
round trip, so staging ADDS a transfer per bond instead of hiding one) and
``copy_to_host_async`` (poisons the later ``np.asarray`` — 188 s for an
80 KB array).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

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

    # bound on wings held on device beyond the keep window (deferred
    # demotions) — each is one wing, so residency stays O(keep)
    MAX_PENDING = 2

    def __init__(self, keep: int = 3, spool_dir: Optional[str] = None):
        super().__init__()
        self.keep = keep
        self._host: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._pending: List[tuple] = []      # (site, dev_arr, dev_sig) deferred
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

    # -- promotion ----------------------------------------------------------

    def get(self, j: int):
        if j in self._d:
            return self._d[j]
        for i, (k, arr, sig) in enumerate(self._pending):
            if k == j:      # still in flight down — reuse the device buffers
                self._pending.pop(i)
                env = (arr, sig)
                self._d[j] = env
                return env
        if j in self._host:
            arr, sig = self._host.pop(j)
            env = (jax.device_put(arr), jax.device_put(sig))
            self._d[j] = env
            return env
        if j in self._spool_meta:
            env = self._read_spool(j)
            self._d[j] = env
            return env
        raise KeyError(j)

    def _read_spool(self, j: int):
        size_key, slot, shape, dtype, sshape = self._spool_meta.pop(j)
        spool, _ = self._spools[size_key]
        flat = spool.read(slot, np.empty(
            int(np.prod(shape)) + int(np.prod(sshape)), dtype=np.float32))
        n = int(np.prod(shape))
        arr = flat[:n].reshape(shape).astype(dtype)
        sig = flat[n:].reshape(sshape)
        return (jax.device_put(arr), jax.device_put(sig))

    # -- demotion -----------------------------------------------------------

    def put(self, j: int, env) -> None:
        self._d[j] = env
        # defer the device->host fetch by MAX_PENDING bonds: the wing written
        # at bond b is re-read at bond b+1, so the pending window serves that
        # re-read from the still-device-resident buffer instead of paying a
        # demote+promote round trip.  (NOTE: jax's copy_to_host_async is NOT
        # used — through the remote-TPU tunnel it poisons the later np.asarray,
        # measured 188 s for a 80 KB array.)
        for k in [k for k in self._d if abs(k - j) > self.keep]:
            self._pending.append((k, *self._d.pop(k)))
        while len(self._pending) > self.MAX_PENDING:
            self._materialize(*self._pending.pop(0))

    def _materialize(self, k: int, arr, sig) -> None:
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
        return (j in self._d or j in self._host or j in self._spool_meta
                or any(k == j for k, _, _ in self._pending))

    def __len__(self) -> int:
        return (len(self._d) + len(self._host) + len(self._spool_meta)
                + len(self._pending))

    def clear(self) -> None:
        super().clear()
        self._host.clear()
        self._pending.clear()
        self._spool_meta.clear()

    def sites(self):
        return (set(self._d) | set(self._host) | set(self._spool_meta)
                | {k for k, _, _ in self._pending})

    def device_resident(self) -> int:
        return len(self._d) + len(self._pending)
