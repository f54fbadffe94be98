"""Persistent XLA compilation cache.

Remote (tunneled) TPU compilation costs minutes per program set; the persistent
cache brings warm-start sweeps from ~100-300 s down to seconds.  Apps, bench, and
tests call this; library imports never set global config themselves.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        base = os.environ.get("TNML_JAX_CACHE")
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "unknown"
        if base is None:
            # CPU AOT cache entries embed host machine-feature strings that this
            # VM compares unreliably (spurious SIGILL warnings on every load), and
            # CPU compiles are cheap — persistent caching is for the (remote) TPU.
            if platform == "cpu":
                return
            base = os.path.join(os.path.expanduser("~"), ".cache", "tnml_tpu", "xla")
        path = f"{base}-{platform}"
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
