"""Platform-selection hygiene for standalone entry points.

The axon TPU plugin registers itself from a ``sitecustomize`` hook at
interpreter start and sets ``jax.config.jax_platforms = "axon,cpu"``
programmatically — which silently overrides a ``JAX_PLATFORMS`` environment
variable the user set (the config write happens after jax read the env).  A
"CPU-only" run then still initializes the TPU backend, and if the pool claim
is wedged (see BENCH_r03 post-mortem) the process hangs at first device use.

Every standalone entry point (the CLI apps, bench.py, __graft_entry__.py)
calls :func:`honor_jax_platforms_env` right after importing jax; pytest gets
the same treatment from ``tests/conftest.py``.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` from the environment over any programmatic
    override, if (and only if) the variable is set.  No-op once backends are
    initialized — call before the first device use."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except Exception:
        pass   # backends already initialized; too late to change
