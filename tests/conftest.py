"""Test configuration: force CPU with 8 virtual devices.

The container's sitecustomize registers the remote 'axon' TPU backend in
every process; tests must run on host CPU (and exercise multi-chip sharding
on a virtual 8-device mesh), so we override the platform before any backend
is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# Enable f64 so differential tests against the double-precision reference
# oracle can compare strictly; production arrays remain f32 (x64 mode does
# not upcast explicitly-typed f32 inputs).
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite re-compiles many scan-heavy programs;
# caching cuts repeat runs by minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
