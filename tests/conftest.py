"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Tests never need real TPU hardware (SURVEY.md section 4: CPU-backend runs so
CI needs no TPU); sharding tests use the virtual device mesh. The axon TPU
plugin re-exports ``JAX_PLATFORMS=axon`` at import time, so the env var alone
is not enough — we must also update the jax config before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
