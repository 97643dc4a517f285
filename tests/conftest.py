"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

TPU hardware (single chip) is exercised separately by bench.py; tests use
float64 on CPU so golden values and QP oracle comparisons are solver-grade.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the session env pre-sets a
                                      # TPU-tunnel platform ("axon")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache-tests")

import jax  # noqa: E402

# a sitecustomize may have imported jax already with the TPU-tunnel platform
# latched; override through the config as well as the env var
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite is compile-bound (~9 min cold);
# warm runs reuse cached executables
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
