"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and run without TPU hardware.

Note: the environment's axon sitecustomize sets jax_platforms=axon at
interpreter start, so the config must be overridden after importing
jax (env vars alone are ignored)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: fill-kernel variants are expensive to
# compile; cache across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/minialign_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
