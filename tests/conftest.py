"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

The reference test-suite runs single-process on CPU in float64
(SURVEY §4).  We mirror that for bit-level parity, and additionally force
8 virtual CPU devices so multi-device sharding / halo-exchange paths can be
exercised without TPU pod hardware (the standard JAX "fake backend" for
sharding tests).

Note: this session's ``sitecustomize.py`` imports jax at interpreter
startup and pins ``JAX_PLATFORMS=axon`` (the TPU tunnel), so overriding the
environment variable here is too late — we must go through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
