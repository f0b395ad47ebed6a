"""Test config: force an 8-device virtual CPU mesh (no TPU needed).

This environment's sitecustomize registers the 'axon' TPU plugin and
overrides jax_platforms at interpreter start, so the JAX_PLATFORMS env var
alone is not enough — the config must be updated after `import jax` (before
any backend is initialized). XLA_FLAGS is still read at CPU-client creation,
so it is set first. A persistent compilation cache amortizes XLA compile
time across test runs.
"""
import os
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()
