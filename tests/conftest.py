"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/halo tests run without TPU hardware (SURVEY.md §4).

The environment's sitecustomize imports jax and registers the TPU plugin at
interpreter start, so env vars are too late here — use jax.config instead
(safe as long as no backend has been initialized yet).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
