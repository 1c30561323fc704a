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


def _u32_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest f32 of a uint32, emulated via an exact hi/lo split.

    ``hi * 2^16`` is exactly representable (<= 16 significant bits) and
    ``lo < 2^16`` is exact, so the single addition performs the one rounding
    — bit-identical to a direct uint32->float32 convert for every input.
    Written this way because Mosaic (Pallas TPU) has no u32->f32 cast, and
    using the same formulation everywhere keeps the fused bounce kernel
    bit-identical to the XLA path."""
    hi = (x >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * np.float32(65536.0) + lo


def next_uniform(seed: jnp.ndarray):
    """One ``random_float`` draw. seed: uint32 array -> (seed', f32 in [0,1))."""
    seed = seed * _MUL + _INC
    shift = (seed >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((seed >> shift) ^ seed) * _OUT
    result = (result >> jnp.uint32(22)) ^ result
    return seed, _u32_to_f32(result) * _INV


# cos(2*pi*y) Taylor coefficients in y^2, k = 7..0: (-1)^k (2pi)^(2k)/(2k)!
# evaluated in float64 then rounded; |y| <= 1/4 after folding, where the
# truncation error is ~1e-9 (below half an f32 ulp of the result)
_COS2PI_C = [np.float32((-1.0) ** k * (2.0 * np.pi) ** (2 * k)
                        / float(__import__("math").factorial(2 * k)))
             for k in range(7, -1, -1)]


def cos_2pi(u: jnp.ndarray) -> jnp.ndarray:
    """cos(2*pi*u) for u in turns — the form every renderer cos takes.

    The generic jnp.cos pays a full huge-argument range reduction that
    Mosaic and XLA:TPU expand to ~0.43 ms per 2M-ray call (measured; it
    was the single largest cost in the whole render step).  In turns the
    reduction is exact and cheap: fold to a quarter period (both
    subtractions are Sterbenz-exact) and evaluate a degree-14 Taylor
    polynomial — ~15 VPU ops, max error ~2 ulp.  Used by BOTH the XLA
    and Pallas paths so they stay bit-identical."""
    w = u - jnp.round(u)                      # [-0.5, 0.5], exact
    a = jnp.abs(w)
    flip = a > 0.25
    y = jnp.where(flip, np.float32(0.5) - a, a)   # [0, 0.25], exact
    y2 = y * y
    p = jnp.full_like(y2, _COS2PI_C[0])
    for c in _COS2PI_C[1:]:
        p = p * y2 + c
    return jnp.where(flip, -p, p)


def next_normal(seed: jnp.ndarray):
    """Box-Muller normal draw, mirroring ``random_float_normal``
    (render.cl:150-154): theta = 2pi*u1; rho = sqrt(-2 ln u2); rho*cos(theta).
    Consumes exactly 2 uniforms.  cos evaluates in turns (cos_2pi) —
    distribution-identical to the reference's cos(2*M_PI_F*u1) and ~30x
    cheaper on TPU.

    DELIBERATELY reproduced hazard: the hash can emit u2 == 0 exactly
    (1-in-2^32 per draw), and ln(0) = -inf makes rho infinite — the
    reference has the identical behavior, so a ~megapixel render grows
    a handful of non-finite pixels as steps accumulate (measured: 6 of
    518400 at 960x540 after 200 steps).  The oracle shares the RNG
    stream, so the same pixels blow up on both sides;
    scripts/parity_rmse.py reports each side's non-finite mask and
    their agreement, and computes linear RMSE over mutually-finite
    pixels.  "Fixing" this here would break RNG stream parity."""
    seed, u1 = next_uniform(seed)
    seed, u2 = next_uniform(seed)
    rho = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u2))
    return seed, rho * cos_2pi(u1)


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
