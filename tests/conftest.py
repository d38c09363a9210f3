"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the backend is pinned through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: SGPN CPU compiles dominate test wall-time
jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
