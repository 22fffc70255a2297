"""Test harness: force an 8-device CPU 'fake mesh'.

This is the standard JAX trick for testing multi-device sharding without
hardware (SURVEY.md §4): all sharding/collective tests in this suite run on
8 virtual CPU devices; the driver separately dry-runs the multi-chip path.

Note: this machine's sitecustomize imports jax and registers the 'axon'
TPU plugin at interpreter startup, so JAX_PLATFORMS from the environment is
already baked into jax.config by the time pytest loads this file. We
therefore override via jax.config.update (valid while backends are still
uninitialized) rather than os.environ alone.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
