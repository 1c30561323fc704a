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

import jax
import jax.numpy as jnp
import numpy as np

from .vec import Vec3, dot, mix, where as vwhere
from .scene_types import SkyParams, SkyboxTex

_INV_PI = np.float32(1.0 / 3.14159274101257324)


# Skyboxes up to this many texels use the MXU two-hot-matmul sampler;
# larger ones fall back to the XLA row-gather path (slower but any size).
MATMUL_TEXEL_LIMIT = 128 * 256


def _taps(h: int, w: int, u: jnp.ndarray, v: jnp.ndarray):
    """OpenCL normalized-coordinate CL_FILTER_LINEAR tap setup: sample
    centers at (u*W - 0.5, v*H - 0.5), integer taps clamped to edge."""
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
    return x0i, x1i, y0i, y1i, ax, ay


def sample_equirect_gather(skybox: Vec3, u: jnp.ndarray,
                           v: jnp.ndarray) -> Vec3:
    """Bilinear clamp-to-edge sample via 4 row gathers (any skybox size)."""
    h, w = skybox.x.shape
    x0i, x1i, y0i, y1i, ax, ay = _taps(h, w, u, v)

    rows = jnp.stack([skybox.x.reshape(-1), skybox.y.reshape(-1),
                      skybox.z.reshape(-1)], axis=-1)  # (H*W, 3)

    def g(yi, xi):
        t = rows[yi * w + xi]
        return Vec3(t[:, 0], t[:, 1], t[:, 2])

    top = g(y0i, x0i) * (1.0 - ax) + g(y0i, x1i) * ax
    bot = g(y1i, x0i) * (1.0 - ax) + g(y1i, x1i) * ax
    return top * (1.0 - ay) + bot * ay


def _twohot(i0, i1, a, n):
    """(R, n) weights: (1-a) at column i0 plus a at i1 (they sum correctly
    to 1 when clamping collapses i0 == i1 at the edges)."""
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    return (jnp.where(iota == i0[:, None], (1.0 - a)[:, None], 0.0)
            + jnp.where(iota == i1[:, None], a[:, None], 0.0))


def sample_equirect_matmul(skybox: Vec3, u: jnp.ndarray,
                           v: jnp.ndarray) -> Vec3:
    """Bilinear sample as a two-hot row matmul on the MXU + a per-ray
    column mix — TPU has no texture units and XLA's dynamic gather is
    element-serial, so the separable bilinear weights become dense
    (sparse-by-construction) matrix products instead.  Precision HIGHEST
    keeps the result f32-exact (TPU f32 matmuls default to bf16 passes)."""
    h, w = skybox.x.shape
    x0i, x1i, y0i, y1i, ax, ay = _taps(h, w, u, v)
    img = jnp.stack([skybox.x, skybox.y, skybox.z], axis=-1)  # (H, W, 3)
    wv = _twohot(y0i, y1i, ay, h)                             # (R, H)
    wu = _twohot(x0i, x1i, ax, w)                             # (R, W)
    tmp = jnp.dot(wv, img.reshape(h, w * 3),
                  precision=jax.lax.Precision.HIGHEST)        # (R, W*3)
    out = jnp.einsum('rwc,rw->rc', tmp.reshape(-1, w, 3), wu,
                     precision=jax.lax.Precision.HIGHEST)
    return Vec3(out[:, 0], out[:, 1], out[:, 2])


def sample_equirect(skybox: Vec3, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """Bilinear clamp-to-edge sample of a (H, W) per-channel image at
    normalized (u, v) arrays of shape (R,).  Picks the MXU matmul sampler
    for small images, the gather sampler for large ones; both implement the
    same OpenCL sampler semantics (tracer.cpp:48) exactly."""
    h, w = skybox.x.shape
    if h * w <= MATMUL_TEXEL_LIMIT:
        return sample_equirect_matmul(skybox, u, v)
    return sample_equirect_gather(skybox, u, v)


def _decode_rgb8(q: jnp.ndarray) -> Vec3:
    """u32 rgb8 -> linear Vec3: (c/255)^2.2 per channel in f32, the
    stbi_loadf LDR->HDR conversion (tracer.cpp:42-55 loads the skybox
    through it).  Matches io.image.load_skybox's host-side linearization
    up to pow LSBs."""
    c = lambda s: jnp.power(((q >> s) & jnp.uint32(0xFF)).astype(jnp.float32)
                            / jnp.float32(255.0), jnp.float32(2.2))
    return Vec3(c(0), c(8), c(16))


def _decode_rgbe(q: jnp.ndarray) -> Vec3:
    """u32 RGBE -> linear Vec3: mantissa * 2^(e - 136), E == 0 -> black —
    stb__hdr_convert semantics (io.image._rgbe_to_float)."""
    e = ((q >> 24) & jnp.uint32(0xFF)).astype(jnp.int32)
    scale = jnp.where(e == 0, jnp.float32(0.0),
                      jnp.ldexp(jnp.float32(1.0), e - 136))
    c = lambda s: ((q >> s) & jnp.uint32(0xFF)).astype(jnp.float32) * scale
    return Vec3(c(0), c(8), c(16))


def sample_equirect_quad(tex: SkyboxTex, u: jnp.ndarray,
                         v: jnp.ndarray) -> Vec3:
    """Bilinear clamp-to-edge sample from the quad-packed texture: ONE
    (N, 4)-u32 row gather per ray fetches the whole 2x2 footprint (see
    SkyboxTex for why this is ~5x faster than four f32 tap gathers on
    TPU), then taps decode and mix with the same expressions as
    sample_equirect_gather."""
    h, w = tex.shape
    x0i, x1i, y0i, y1i, ax, ay = _taps(h, w, u, v)
    # The barriers pin the gather as its OWN fusion: left to itself XLA
    # fuses this gather into the surrounding consumer loop, which lowers
    # it element-serial (~12 ms at 2M rays in the full render step); as a
    # standalone fusion it runs at memory speed (~0.04 ms measured).
    idx = jax.lax.optimization_barrier(y0i * w + x0i)
    q = jax.lax.optimization_barrier(tex.quad.reshape(h * w, 4)[idx])
    decode = _decode_rgb8 if tex.mode == "rgb8" else _decode_rgbe
    p00 = decode(q[:, 0])
    p01 = decode(q[:, 1])
    p10 = decode(q[:, 2])
    p11 = decode(q[:, 3])
    # Low-edge clamp: when floor(u*W - .5) < 0 both taps collapse to
    # column 0, but the anchor-0 quad row stores column 1 as its right
    # neighbor — substitute the left tap so the mix uses column 0 twice,
    # exactly like the clamped gather.  (The high edge already stores
    # the clamped duplicate in the table.)  Same for rows.
    edge_x = x1i == x0i
    edge_y = y1i == y0i
    p01 = vwhere(edge_x, p00, p01)
    p11 = vwhere(edge_x, p10, p11)
    p10 = vwhere(edge_y, p00, p10)
    p11 = vwhere(edge_y, p01, p11)
    top = p00 * (1.0 - ax) + p01 * ax
    bot = p10 * (1.0 - ax) + p11 * ax
    return top * (1.0 - ay) + bot * ay


def _pack_channels(u8: np.ndarray) -> np.ndarray:
    """(H, W, C<=4) u8 -> (H, W) u32 little-endian packed."""
    q = np.zeros(u8.shape[:2], np.uint32)
    for c in range(u8.shape[-1]):
        q |= u8[..., c].astype(np.uint32) << (8 * c)
    return q


def _quad_table(packed: np.ndarray) -> np.ndarray:
    """(H, W) u32 texels -> (H, W, 4) u32 quad rows with clamped
    neighbors: [p(y,x), p(y,x+1), p(y+1,x), p(y+1,x+1)]."""
    h, w = packed.shape
    x1 = np.minimum(np.arange(w) + 1, w - 1)
    y1 = np.minimum(np.arange(h) + 1, h - 1)
    return np.stack([packed, packed[:, x1],
                     packed[y1, :], packed[y1][:, x1]], axis=-1)


def pack_skybox_quad(img: np.ndarray):
    """Try to pack an (H, W, 3) f32 linear image into the quad-gather
    layout; returns a SkyboxTex or None when no LOSSLESS packing exists.

    Recovery rather than plumbing: the loaders hand the engine an
    already-linearized f32 image (io.image.load_skybox), so we invert
    the two supported encodings and accept only if the roundtrip is
    bit-exact — 8-bit LDR sources ((u/255)^2.2) and Radiance RGBE HDR
    sources both recover exactly; arbitrary float images (procedural
    skies, resampled data) fall back to the f32 sampler unchanged."""
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim != 3 or img.shape[-1] != 3 or not np.isfinite(img).all():
        return None
    # -- 8-bit gamma-2.2 recovery
    if (img >= 0).all() and (img <= 1.0).all():
        u8 = np.clip(np.rint(255.0 * np.power(img, np.float32(1 / 2.2),
                                              dtype=np.float32)),
                     0, 255).astype(np.uint8)
        rec = np.power(u8.astype(np.float32) / 255.0, np.float32(2.2),
                       dtype=np.float32)
        if np.array_equal(rec, img):
            return SkyboxTex(jnp.asarray(_quad_table(_pack_channels(u8))),
                             "rgb8")
    # -- Radiance RGBE recovery (the canonical encoder from io.image)
    from ..io.image import float_to_rgbe, _rgbe_to_float
    rgbe = float_to_rgbe(img)
    if np.array_equal(_rgbe_to_float(rgbe), img):
        return SkyboxTex(jnp.asarray(_quad_table(_pack_channels(rgbe))),
                         "rgbe")
    return None


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def sky_gradient(d: Vec3, sky: SkyParams) -> Vec3:
    """Analytic three-color gradient sky + masked sun.

    This is the reference's own gradient design (render.cl:381-389 — the
    code is commented out there in favor of the texture, but its horizon/
    zenith/ground parameters survive in SceneData and the UI):
      t   = pow(smoothstep(0, 0.4, y), 0.35); sky = mix(horizon, zenith, t)
      g2s = smoothstep(-0.01, 0, y); sun shown only when g2s >= 1
      mix(ground, sky, g2s) + sun * sun_mask
    Pure arithmetic — no texture gather — so it is the fast default
    environment when no skybox image is supplied."""
    t = jnp.power(_smoothstep(0.0, 0.4, d.y), jnp.float32(0.35))
    grad = mix(sky.horizon_color, sky.zenith_color, t)
    g2s = _smoothstep(-0.01, 0.0, d.y)
    sun_cos = jnp.maximum(dot(d, -sky.sun_direction), 0.0)
    sun_term = (jnp.power(sun_cos, sky.sun_focus) * sky.sun_intensity
                * (g2s >= 1.0))
    return mix(sky.ground_color, grad, g2s) + sky.sun_color * sun_term


def sky_color(d: Vec3, sky: SkyParams, skybox) -> Vec3:
    """Full environment radiance along miss direction d (unit).

    skybox=None selects the analytic gradient; otherwise the equirect
    texture + unmasked sun (the reference's active path, render.cl:390-393).
    """
    if skybox is None:
        return sky_gradient(d, sky)
    sun_cos = jnp.maximum(dot(d, -sky.sun_direction), 0.0)
    sun_term = jnp.power(sun_cos, sky.sun_focus) * sky.sun_intensity
    sun = sky.sun_color * sun_term

    u = jnp.arctan2(d.z, d.x) * _INV_PI * 0.5 + 0.5
    v = d.y * 0.5 + 0.5
    if isinstance(skybox, SkyboxTex):
        return sample_equirect_quad(skybox, u, v) + sun
    return sample_equirect(skybox, u, v) + sun


# (A baked-image "procedural_skybox" used to live here; it duplicated
# sky_gradient's math with no caller — the no-skybox path evaluates
# sky_gradient analytically, which is both exact and gather-free.)
