"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on host CPU devices
(xla_force_host_platform_device_count), per the test strategy in SURVEY.md §4.
The shell environment pins JAX_PLATFORMS=axon (the TPU tunnel), so tests must
force-override it *and* update the config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 validation paths in fold tests
