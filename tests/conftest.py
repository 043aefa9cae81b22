"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for multi-node testing (SURVEY.md section 4):
sharding/collective code paths compile and execute against 8 virtual CPU
devices, while numerics tests stay fast and deterministic.

NOTE: in this environment jax is pre-imported by sitecustomize and
``JAX_PLATFORMS=axon`` (the TPU tunnel) is exported, so we must both override
the env var *and* update the already-imported jax config before any backend
is initialised.  Tests must never touch the real TPU — it is a single-client
resource reserved for bench runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the suite recompiles the same detector /
# tracker programs every run (and the e2e tests recompile them in fresh
# subprocesses); caching them takes the full suite from >20 min to minutes.
CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "stereotracking_jax"))
os.makedirs(CACHE_DIR, exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Keep f32 matmuls exact in numerics tests (TPU default would be bf16).
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; TPU is reserved for benchmarks")
