"""Test configuration: force an 8-device CPU mesh so sharding/collective
paths run in CI without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax is imported by any test module.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
