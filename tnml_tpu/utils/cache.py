"""Persistent XLA compilation cache.

Remote (tunneled) TPU compilation costs minutes per program set; the persistent
cache brings warm-start sweeps from ~100-300 s down to seconds.  Apps, bench, and
tests call this; library imports never set global config themselves.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "TNML_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tnml_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
