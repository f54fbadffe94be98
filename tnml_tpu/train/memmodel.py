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
the detected device's ``memory_stats()['bytes_limit']`` with a 0.85 headroom
factor (features + cores + CG working set ride alongside the wings); fallback
13 GiB, the empirically safe share of a 16 GB v5e chip.
"""

from __future__ import annotations

import os
from typing import Optional

_FALLBACK_BUDGET = 13.0 * 2**30   # safe share of a 16 GB chip (v5e)
_HEADROOM = 0.85


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


def fused_budget_bytes(device=None) -> float:
    """HBM budget for the fused wing buffers, in bytes.

    ``TNML_FUSED_FIXED_MAX_BYTES`` overrides (the single knob).  Otherwise
    derive from the detected device's ``memory_stats()`` so v4/v5p/v6e chips
    with more HBM keep the resident engine longer (round-3 advisor finding:
    a hardcoded 16 GB assumption mis-routes every other chip generation).
    """
    env = os.environ.get("TNML_FUSED_FIXED_MAX_BYTES")
    if env:
        return float(env)
    try:
        import jax
        dev = device if device is not None else jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return _HEADROOM * float(limit)
    except Exception:
        pass
    return _FALLBACK_BUDGET


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
