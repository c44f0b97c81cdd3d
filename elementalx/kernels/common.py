"""Shared kernel utilities: TPU detection, tiling helpers."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:  # no backend yet
        return False
    return plat in ("tpu", "axon")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def min_tile(dtype) -> tuple:
    """Minimum (sublane, lane) tile for a dtype (pallas_guide: Tiling
    Constraints)."""
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.bfloat16) or dt == jnp.dtype(jnp.float16):
        return (16, 128)
    if dt.itemsize == 1:
        return (32, 128)
    return (8, 128)
