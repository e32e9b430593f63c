"""Test configuration: force local CPU devices with an 8-device mesh so
sharding/collective paths run in CI without TPU hardware (SURVEY.md §4).

The environment boots jax at interpreter start via a sitecustomize that
registers the remote "axon" TPU backend and sets JAX_PLATFORMS=axon, so
env vars set here are too late — use jax.config.update instead, which
takes effect because no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on local CPU, got %r" % jax.devices())
assert jax.device_count() == 8, (
    "expected 8 virtual CPU devices, got %d" % jax.device_count())


def pytest_configure(config):
    """On a single-core host, run the quick lane in-process: each of
    pytest.ini's 4 xdist workers pays its own ~10s jax import plus
    scheduler churn, which on 1 CPU is pure overhead (measured: the
    quick lane is jax-import + CLI-subprocess bound there). Multicore
    hosts keep the parallel default."""
    if (os.cpu_count() == 1 and "quick" in (config.option.markexpr or "")
            and getattr(config.option, "numprocesses", None)):
        config.option.numprocesses = 0
        config.option.dist = "no"
