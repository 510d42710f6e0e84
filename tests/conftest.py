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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
