"""Test configuration: force CPU with 8 virtual devices (sharding tests run
the same jitted step on an 8-device mesh and must equal the single-device
result), and enable x64 so the f64 oracle comparisons are exact."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
