"""Test configuration: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4
item 5) so sharding tests need no TPU cluster and codec tests are deterministic.

NOTE: the environment's experimental 'axon' TPU plugin ignores the
JAX_PLATFORMS environment variable, so the platform must be forced through
jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache keeps repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aukit_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# opt-in NaN debugging for the device paths (SURVEY.md §5.2)
if os.environ.get("AUKIT_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)
