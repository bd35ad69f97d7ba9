"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU pod (SURVEY.md §4 'Implication for the TPU
build').

NOTE: this environment's 'axon' TPU plugin overrides the JAX_PLATFORMS env
var, so the platform must be forced via jax.config *before any computation*.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
