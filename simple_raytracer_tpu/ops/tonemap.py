"""Progressive-average tonemap: mean -> ACES -> gamma 2.0 -> u8.

Mirrors ``__kernel average`` + ``aces`` (render.cl:473-535): the canvas is
the running radiance sum across still frames; dividing by the step count
yields the mean, which is ACES-filmic tonemapped, sqrt gamma-encoded, and
packed to bytes with C-cast truncation (x * 255 floored).
"""
from __future__ import annotations

import jax.numpy as jnp


def aces(x: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic curve (render.cl:473-481), clamped to [0, 1]."""
    a = jnp.float32(2.51)
    b = jnp.float32(0.03)
    c = jnp.float32(2.43)
    d = jnp.float32(0.59)
    e = jnp.float32(0.14)
    return jnp.clip((x * (x * a + b)) / (x * (x * c + d) + e), 0.0, 1.0)


def tonemap_u8(canvas: jnp.ndarray, num_steps) -> jnp.ndarray:
    """(H, W, 3) f32 radiance sum + step count -> (H, W, 3) u8 RGB.

    The reference packs ARGB with alpha first (render.cl:534); the PPM
    writer then strips alpha (parser.cpp:10-14), so RGB is the portable
    equivalent output."""
    color = canvas / jnp.float32(num_steps)
    color = aces(color)
    color = jnp.sqrt(color)
    return (color * 255.0).astype(jnp.uint8)
