"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU pod (SURVEY.md §4 'Implication for the TPU
build').

NOTE: this environment's 'axon' TPU plugin overrides the JAX_PLATFORMS env
var, so the platform must be forced via jax.config *before any computation*.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache under pytest: reloading CPU AOT cache
# entries segfaulted the suite deterministically at the same test on
# this host (XLA cpu_aot_loader, r5; same class as the r4 cross-machine
# SIGILL).  CPU test programs compile in milliseconds anyway.
os.environ.setdefault("GOOGLE_NERF_TPU_NO_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
