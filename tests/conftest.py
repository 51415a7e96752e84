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
