"""Test configuration: force an 8-device virtual CPU mesh.

The analog of multi-node testing without a cluster (SURVEY.md §4): all
sharding/collective tests run against 8 virtual CPU devices. Must run
before any jax backend initialization, hence the env fiddling at import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is dominated by compile
# time (scan/pallas-interpret graphs), so repeat runs drop from minutes
# to seconds. Keyed by jaxlib version internally; safe to share.
_cache_dir = os.environ.get(
    "MRGEN_JAX_CACHE", os.path.expanduser("~/.cache/mrgen-jax-test-cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
