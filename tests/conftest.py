"""Test config: force an 8-device virtual CPU mesh (no TPU needed).

The environment pins JAX_PLATFORMS=axon (the single-chip TPU tunnel); tests
must override it — multi-device sharding tests need the virtual CPU mesh and
CI must not depend on TPU availability. A persistent compilation cache
amortizes XLA-CPU compile time across test runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rdeic_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
