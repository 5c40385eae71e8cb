"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


LANE = 128


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU (incl. the 'axon'
    tunneled platform which reports TPU devices)."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    return "tpu" in dev.platform.lower() or "TPU" in str(dev.device_kind)


def use_interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CPU test meshes)."""
    return not on_tpu()


def pad2d(x: jax.Array, rows: int, cols: int) -> jax.Array:
    """Zero-pad a 2-D array up to (rows, cols). No-op if already that shape."""
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr == 0 and pc == 0:
        return x
    return jnp.pad(x, ((0, pr), (0, pc)))
