"""Test harness: CPU backend with 8 virtual devices (stands in for an ICI
mesh, per SURVEY.md section 4 implication 5) and float64 enabled so oracle
comparisons are meaningful.

Note: the environment's sitecustomize pins jax_platforms to the axon TPU
plugin regardless of JAX_PLATFORMS, so we override via jax.config *after*
import -- env vars alone are not enough here."""

import os
import tempfile

# run-scoped log dir: demo-config sims inside tests must not clobber the
# committed artifacts/LOG*.TXT evidence (VERDICT r3 weak-6)
os.environ.setdefault("PHOTONS_LOG_DIR",
                      tempfile.mkdtemp(prefix="photons_test_logs_"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: shard_map/interpret-Pallas compiles dominated
# the round-1 suite (~45 min); cached reruns cut most of it.
# NOTE: must NOT share a directory with TPU-side runs -- the axon remote
# AOT helper emits CPU executables with different machine features that
# fail to load here (fft_thunk layout RET_CHECKs, SIGILL warnings).
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
