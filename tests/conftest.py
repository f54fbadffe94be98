"""Test configuration: run the suite on CPU with 8 virtual devices.

Sharded (psum / shard_map) code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` — the multi-chip test strategy prescribed in
SURVEY.md §4.  Must run before the first ``import jax`` anywhere in the suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env pins the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TNML_CACHE", os.path.join(os.path.dirname(__file__), ".cache"))

# A pytest plugin may have imported jax before this conftest ran, freezing
# jax_platforms from the original environment — override via the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
