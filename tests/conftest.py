"""Test config: force an 8-device CPU mesh so pjit/sharding paths are
exercised without TPU hardware (SURVEY.md section 4, multi-node testing).

The container's sitecustomize imports jax at interpreter startup (axon TPU
plugin registration), so JAX_PLATFORMS set via os.environ here is too late —
the already-initialized config must be updated instead.  XLA_FLAGS is still
read at first backend initialization, so the device-count flag works as an
env var as long as no jax computation ran yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
