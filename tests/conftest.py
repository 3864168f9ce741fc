"""Test harness: CPU backend with 8 virtual devices (stands in for an ICI
mesh, per SURVEY.md section 4 implication 5) and float64 enabled so oracle
comparisons are meaningful.

Note: the environment's sitecustomize pins jax_platforms to the axon TPU
plugin regardless of JAX_PLATFORMS, so we override via jax.config *after*
import -- env vars alone are not enough here."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
