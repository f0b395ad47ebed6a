"""Backend/platform selection for the CLIs.

This deployment routes JAX to a remote-TPU tunnel via sitecustomize, and a
dead tunnel endpoint makes the first jax.devices() block forever — env vars
alone cannot override the pin (the sitecustomize re-sets jax_platforms at
interpreter start). Every CLI therefore takes --platform (or the
RDEIC_PLATFORM env var) and applies it through jax.config BEFORE any
backend query, giving users a working escape hatch (`--platform cpu`).
"""
from __future__ import annotations

import os


def add_platform_arg(ap) -> None:
    ap.add_argument(
        "--platform", type=str, default=None,
        choices=["cpu", "tpu", "axon"],
        help="force the JAX platform (default: the box's configured "
             "backend; RDEIC_PLATFORM env var is the flagless equivalent). "
             "Use 'cpu' when the TPU tunnel is down.",
    )


def apply_platform(platform: str | None) -> None:
    """Apply a platform choice before any JAX backend initialization."""
    platform = platform or os.environ.get("RDEIC_PLATFORM")
    if not platform:
        return
    import jax  # noqa: PLC0415

    jax.config.update("jax_platforms", platform)
