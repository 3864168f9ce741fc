"""Test harness: CPU backend with 8 virtual devices (stands in for an ICI
mesh, per SURVEY.md section 4 implication 5) and float64 enabled so oracle
comparisons are meaningful."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
