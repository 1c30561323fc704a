"""Environment light: equirect skybox sample + analytic sun.

Mirrors ``sky_box`` (render.cl:380-394):
  u = atan2pi(z, x) * 0.5 + 0.5
  v = y * 0.5 + 0.5                 # linear in y, deliberately NOT asin
  sun = pow(max(dot(d, -sun_dir), 0), focus) * sun_color * intensity
  result = bilinear_sample(skybox, u, v) + sun

TPUs have no texture units, so the OpenCL normalized-coordinate
CL_FILTER_LINEAR / CL_ADDRESS_CLAMP_TO_EDGE sampler (tracer.cpp:48) is
reproduced as an explicit gather: sample centers at (u*W - 0.5, v*H - 0.5),
integer taps clamped to the edge.  The skybox image is stored bottom-up
(stbi_set_flip_vertically_on_load, tracer.cpp:44).
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, dot
from .scene_types import SkyParams

_INV_PI = jnp.float32(1.0 / 3.14159274101257324)


def sample_equirect(skybox: Vec3, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """Bilinear clamp-to-edge sample of a (H, W) per-channel image at
    normalized (u, v) arrays of shape (R,)."""
    h, w = skybox.x.shape
    fx = u * jnp.float32(w) - 0.5
    fy = v * jnp.float32(h) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = fx - x0
    ay = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = Vec3(skybox.x.reshape(-1), skybox.y.reshape(-1), skybox.z.reshape(-1))
    i00 = y0i * w + x0i
    i01 = y0i * w + x1i
    i10 = y1i * w + x0i
    i11 = y1i * w + x1i

    def g(i):
        return Vec3(flat.x[i], flat.y[i], flat.z[i])

    top = g(i00) * (1.0 - ax) + g(i01) * ax
    bot = g(i10) * (1.0 - ax) + g(i11) * ax
    return top * (1.0 - ay) + bot * ay


def sky_color(d: Vec3, sky: SkyParams, skybox: Vec3) -> Vec3:
    """Full environment radiance along miss direction d (unit)."""
    sun_cos = jnp.maximum(dot(d, -sky.sun_direction), 0.0)
    sun_term = jnp.power(sun_cos, sky.sun_focus) * sky.sun_intensity
    sun = sky.sun_color * sun_term

    u = jnp.arctan2(d.z, d.x) * _INV_PI * 0.5 + 0.5
    v = d.y * 0.5 + 0.5
    return sample_equirect(skybox, u, v) + sun


def procedural_skybox(height: int = 256, width: int = 512,
                      horizon=(0x37 / 255, 0x4F / 255, 0x62 / 255),
                      zenith=(0x11 / 255, 0x33 / 255, 0x4A / 255),
                      ground=(0x77 / 255, 0x77 / 255, 0x77 / 255)) -> Vec3:
    """Default environment when no skybox file is given.

    Reconstructs the reference's commented-out analytic gradient
    (render.cl:381-389) as a baked equirect image, using the surviving
    SceneData horizon/zenith/ground defaults (main.cpp:120-126):
      t = pow(smoothstep(0, 0.4, y), 0.35); sky = mix(horizon, zenith, t)
      ground_to_sky = smoothstep(-0.01, 0, y); mix(ground, sky, g2s)
    The image v axis is linear in direction.y (render.cl:391), bottom-up.
    """
    import numpy as np

    v = (np.arange(height, dtype=np.float32) + 0.5) / height
    y = v * 2.0 - 1.0

    def smoothstep(e0, e1, x):
        t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    t = np.power(smoothstep(0.0, 0.4, y), 0.35)
    g2s = smoothstep(-0.01, 0.0, y)
    horizon = np.asarray(horizon, np.float32)
    zenith = np.asarray(zenith, np.float32)
    ground = np.asarray(ground, np.float32)
    sky = horizon[None, :] + (zenith - horizon)[None, :] * t[:, None]
    col = ground[None, :] + (sky - ground[None, :]) * g2s[:, None]
    img = np.broadcast_to(col[:, None, :], (height, width, 3)).copy()
    return Vec3(jnp.asarray(img[..., 0]), jnp.asarray(img[..., 1]),
                jnp.asarray(img[..., 2]))
