"""Persistent XLA compile cache (compiles through the TPU tunnel are slow)."""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax  # noqa: PLC0415

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("RDEIC_CACHE_DIR", "/tmp/rdeic_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
