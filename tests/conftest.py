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
