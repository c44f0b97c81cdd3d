"""RNG utilities (reference: src/core/random.cpp, include/El/core/random/).

The reference keeps a per-process seeded mt19937; here a single functional
PRNG key chain (threefry) drives all sampling, with a module-level key for
the El-style stateful API (Uniform/Gaussian generators in matrices/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_state = {"key": jax.random.key(0)}


def SeedRandom(seed: int) -> None:
    """Reference: El::random::Seed."""
    _state["key"] = jax.random.key(int(seed))


def next_key() -> jax.Array:
    """Split off a fresh subkey from the global chain."""
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def SampleUniform(shape, dtype=jnp.float32, lo=0.0, hi=1.0, key=None) -> jax.Array:
    k = key if key is not None else next_key()
    if jnp.issubdtype(dtype, jnp.complexfloating):
        real_dt = jnp.finfo(dtype).dtype.name.replace("complex", "float")
        kr, ki = jax.random.split(k)
        re = jax.random.uniform(kr, shape, jnp.dtype(real_dt), lo, hi)
        im = jax.random.uniform(ki, shape, jnp.dtype(real_dt), lo, hi)
        return (re + 1j * im).astype(dtype)
    return jax.random.uniform(k, shape, dtype, lo, hi)


def SampleNormal(shape, dtype=jnp.float32, mean=0.0, stddev=1.0, key=None) -> jax.Array:
    k = key if key is not None else next_key()
    if jnp.issubdtype(dtype, jnp.complexfloating):
        real_dt = jnp.dtype(jnp.finfo(dtype).dtype)
        kr, ki = jax.random.split(k)
        re = jax.random.normal(kr, shape, real_dt)
        im = jax.random.normal(ki, shape, real_dt)
        z = (re + 1j * im) / jnp.sqrt(jnp.asarray(2.0, real_dt))
        return (mean + stddev * z).astype(dtype)
    return mean + stddev * jax.random.normal(k, shape, dtype)
