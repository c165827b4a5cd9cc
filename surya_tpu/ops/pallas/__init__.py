"""Pallas TPU kernels (quadrant processor, fused fusion head)."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """Single owner of the kernel-vs-lax backend dispatch rule (the
    axon plugin latches the platform — see CLAUDE.md)."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - backend init failure
        return False
