"""Single source of truth for the fixed-label fused-engine memory model.

The fixed-label layout's dominant buffers are the bond-aligned wing stacks
(the HBM-resident analog of the reference's disk-batched ``proj_images``
environments, ``/root/reference/fixedL.cc:115-157``):

- labelled far wings: R rows of ``[B, nl, pad]`` where ``R = max(c-1, n-2-c)``
  (the longer of the two label-free segments flanking the label core at
  site ``c``, ``/root/reference/fixedL.cc:616``)
- plain wings: ``n-1`` rows of ``[B, pad]``

Three places must agree on this sizing — the model-level engine router
(``models/fixedl.py::_use_fused``), the engine's resident-vs-blocked variant
choice (``engine.py::_fixed_variant``), and the resident engine's preflight
(``engine.py::_fused_init_fixed``).  Round-3 review found them carrying three
inconsistent copies (10 GB labelled-only vs hardcoded 13 GB total); this
module is now the only sizing + budget code they call.

Budget: ``TNML_FUSED_FIXED_MAX_BYTES`` (bytes) overrides everything; otherwise
the detected device's ``memory_stats()['bytes_limit']`` scaled by a headroom
factor; fallback assumes a 16 GB v5e chip.

RESIDENT headroom is 0.52, calibrated against three measured points on a
15.75 GiB-limit v5e (round 4): B=7,400/pad=120 resident runs (wings 7.6 GB);
B=10,000/pad=120 resident OOMs (wings 10.2 GB, STATUS round-2 capacity
probe); B=58,862/pad=20 resident OOMs with a 20.7 GB program for 9.4 GB of
sized wings (.bench/quality_fullset_fixed_r4_oom.log) — XLA holds a second
transient copy of the labelled stack (remat compress/uncompress + ping-pong
donation), so the usable wing share is ~half the chip, not 0.85 of it.  The
BLOCKED-vs-per-bond fallback keeps the 0.85 factor: the blocked engine's
residency (block boundaries + in-jit rebuild rows) has no such transient
double and is proven at the full 58,862-image set.
"""

from __future__ import annotations

import os
from typing import Optional

_FALLBACK_LIMIT = 15.75 * 2**30   # detected bytes_limit of a 16 GB v5e
_HEADROOM = 0.52                  # resident wings (see module docstring)
_HEADROOM_BLOCKED = 0.85          # blocked residency (no transient double)


def fixed_layout_bytes(nt: int, pad: int, nl: int, c: int, n: int,
                       env_itemsize: int) -> dict:
    """Byte sizes of the fixed-label fused wing buffers for a batch of ``nt``
    images on ``n`` sites with the label core at ``c`` (all per ONE replica —
    divide ``nt`` by the dp shard count first for per-chip numbers)."""
    rows = max(c - 1, n - 2 - c)
    row_bytes = nt * nl * pad * env_itemsize
    labelled = rows * row_bytes
    plain = (n - 1) * nt * pad * env_itemsize
    return {"labelled": labelled, "plain": plain, "total": labelled + plain,
            "rows": rows, "row_bytes": row_bytes}


def blocked_layout_bytes(rows: int, row_bytes: int, K: int) -> int:
    """Labelled-wing residency of the sqrt-memory blocked engine: one boundary
    per K-bond block, the in-jit rebuild buffer (K rows), its f32 carry (~K
    rows at <=2x the storage width), plus a few working rows of headroom."""
    return (-(-rows // K) + 2 * K + 6) * row_bytes


def _device_limit(device=None) -> float:
    try:
        import jax
        dev = device if device is not None else jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return float(limit)
    except Exception:
        pass
    return _FALLBACK_LIMIT


def fused_budget_bytes(device=None) -> float:
    """HBM budget for the RESIDENT fused wing buffers, in bytes.

    ``TNML_FUSED_FIXED_MAX_BYTES`` overrides (the single knob).  Otherwise
    derive from the detected device's ``memory_stats()`` so v4/v5p/v6e chips
    with more HBM keep the resident engine longer (round-3 advisor finding:
    a hardcoded 16 GB assumption mis-routes every other chip generation).
    """
    env = os.environ.get("TNML_FUSED_FIXED_MAX_BYTES")
    if env:
        return float(env)
    return _HEADROOM * _device_limit(device)


def blocked_budget_bytes(device=None) -> float:
    """HBM allowance for the BLOCKED engine's residency (the blocked-vs-
    per-bond fallback decision) — no transient-double penalty applies."""
    env = os.environ.get("TNML_FUSED_FIXED_MAX_BYTES")
    if env:
        return float(env)
    return _HEADROOM_BLOCKED * _device_limit(device)


def shard_count(sharding) -> int:
    """Number of devices a (possibly None) sharding spreads the batch over."""
    if sharding is None:
        return 1
    try:
        return max(1, len(sharding.device_set))
    except Exception:
        return 1


def per_chip_total(nt: int, pad: int, nl: int, c: int, n: int,
                   env_itemsize: int, sharding=None) -> float:
    """Per-chip wing-buffer footprint with the batch dp-sharded."""
    chips = shard_count(sharding)
    nt_chip = -(-nt // chips)
    return fixed_layout_bytes(nt_chip, pad, nl, c, n, env_itemsize)["total"]
