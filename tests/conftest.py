"""Test configuration: force CPU with 8 virtual devices (sharding tests run
the same jitted step on an 8-device mesh and must equal the single-device
result), and enable x64 so the f64 oracle comparisons are exact.

NOTE: the axon site hook imports jax at interpreter startup, so setting
``os.environ['JAX_PLATFORMS']`` here is too late on some paths — use
``jax.config.update('jax_platforms', ...)`` which wins as long as no backend
has been initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
