"""Test config: force an 8-device CPU mesh so pjit/sharding paths are
exercised without TPU hardware (SURVEY.md section 4, multi-node testing)."""

import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
