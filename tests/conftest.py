"""Test configuration: force an 8-device virtual CPU mesh before backends init.

The axon TPU plugin registers itself via sitecustomize and sets the
``jax_platforms`` config, which takes precedence over the JAX_PLATFORMS env
var — so tests must override the *config*. Sharding/collective code paths are
validated on a simulated 8-device CPU mesh via
--xla_force_host_platform_device_count (SURVEY.md §4), the TPU-world analogue
of a fake distributed backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (many jitted
# sampler variants); caching compiled executables across runs cuts repeat
# wall time dramatically. Set BARK_TPU_NO_COMPILE_CACHE=1 to disable.
import pathlib

if not os.environ.get("BARK_TPU_NO_COMPILE_CACHE"):
    _cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
