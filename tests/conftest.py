"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This substitutes for a TPU pod slice in CI (SURVEY.md §4, "Distributed
tests"): sharding/pjit paths compile and run against 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin can override the JAX_PLATFORMS env var; the config API
# takes precedence, so force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# full-precision matmuls for numerical checks in test bodies
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: this box has few cores and XLA compiles
# dominate test wall-time; cache them across runs.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
