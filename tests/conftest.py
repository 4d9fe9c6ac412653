"""Test harness bootstrap.

This container's sitecustomize registers a remote-TPU PJRT plugin and sets
jax.config jax_platforms="axon,cpu" at interpreter start (overriding the
JAX_PLATFORMS env var). Unit tests must run on the local CPU backend — the
remote backend turns every compile into a relay round-trip and wedges under
concurrent processes — so force the config back to cpu before any backend
initializes, and expose an 8-device virtual CPU mesh for sharding tests.
Real-TPU benchmarks go through bench.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persist compiled executables across test runs (slow 4-core CPU here).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FOVSPLAT_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
