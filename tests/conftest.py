"""Test harness: force an 8-device virtual CPU mesh.

This is the JAX-native substitute for the "fake cluster" testing the
reference lacks (see SURVEY.md §4): all sharding/collective paths are
exercised on 8 virtual CPU devices.

NOTE: this image's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and forces the platform, so setting the JAX_PLATFORMS
env var here is NOT enough — we must override through jax.config after
import (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip most XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/resshift_tpu_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
