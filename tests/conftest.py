"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU via
``xla_force_host_platform_device_count`` (no TPU needed for the suite);
the driver's dryrun and bench exercise the real chip.

Note: the environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so the
env var alone is not enough — ``jax.config.update`` wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated, so warm runs
# are far faster.  NOTE: env vars (JAX_COMPILATION_CACHE_DIR) are read at jax
# import time, and the environment's sitecustomize imports jax before pytest
# loads this conftest — so `jax.config.update` is the only reliable hook here.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
