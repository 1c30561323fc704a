"""Counter-free PCG-style RNG, bit-matching the reference hash.

The reference threads a mutable ``uint seed`` through every stochastic draw
(`random_float`, ``src/render.cl:143-148``).  Here the same integer recurrence
is expressed functionally: every draw maps ``seed -> (new_seed, value)`` over
whole ``(N,)`` uint32 arrays, so the per-ray streams are bit-identical to the
reference's per-work-item streams when the draw order matches.

Reference formulas (render.cl:143-163):
  seed   = seed * 747796405 + 2891336453
  result = ((seed >> ((seed >> 28) + 4)) ^ seed) * 277803737
  result = (result >> 22) ^ result
  float  = (float)result / (float)UINT_MAX        # == result * 2^-32 in fp32
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .vec import Vec3, dot, normalize

_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_OUT = np.uint32(277803737)
# (float)UINT_MAX rounds to 2^32 in fp32, and division by 2^32 is an exact
# scale, so this reproduces the reference's float conversion bit-for-bit.
_INV = np.float32(2.0 ** -32)
TWO_PI_F = np.float32(6.2831854820251465)  # 2 * M_PI_F evaluated in fp32


def next_uniform(seed: jnp.ndarray):
    """One ``random_float`` draw. seed: uint32 array -> (seed', f32 in [0,1))."""
    seed = seed * _MUL + _INC
    shift = (seed >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((seed >> shift) ^ seed) * _OUT
    result = (result >> jnp.uint32(22)) ^ result
    return seed, result.astype(jnp.float32) * _INV


def next_normal(seed: jnp.ndarray):
    """Box-Muller normal draw, mirroring ``random_float_normal``
    (render.cl:150-154): theta = 2pi*u1; rho = sqrt(-2 ln u2); rho*cos(theta).
    Consumes exactly 2 uniforms."""
    seed, u1 = next_uniform(seed)
    seed, u2 = next_uniform(seed)
    theta = TWO_PI_F * u1
    rho = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u2))
    return seed, rho * jnp.cos(theta)


def next_direction(seed: jnp.ndarray):
    """Uniform sphere direction, mirroring ``random_direction``
    (render.cl:156-158). Consumes 6 uniforms, components drawn x,y,z."""
    seed, nx = next_normal(seed)
    seed, ny = next_normal(seed)
    seed, nz = next_normal(seed)
    return seed, normalize(Vec3(nx, ny, nz))


def next_direction_hemisphere(normal: Vec3, seed: jnp.ndarray):
    """Mirrors ``random_direction_hemisphere`` (render.cl:160-163):
    dir * sign(dot(normal, dir)) — note sign(0) == 0 exactly like OpenCL."""
    seed, d = next_direction(seed)
    s = jnp.sign(dot(normal, d))
    return seed, d * s


def pixel_seed(sample, pixel_id, num_samples, time):
    """Per-(pixel, sample) stream seed, mirroring render.cl:496:
    ``(sample + id * num_samples) * time * 5304`` in wrapping uint32."""
    sample = jnp.uint32(sample)
    pixel_id = pixel_id.astype(jnp.uint32)
    return (sample + pixel_id * jnp.uint32(num_samples)) * jnp.uint32(time) * jnp.uint32(5304)
