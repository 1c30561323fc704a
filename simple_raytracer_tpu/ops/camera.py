"""Camera matrix construction and primary ray generation.

Reference semantics: ``Camera::camera_matrix`` is ``translate(position) *
eulerAngleYXZ(yaw, pitch, 0)`` (include/helper.hpp:21-26); the render kernel
takes the forward (camera-to-world) matrix, reads the ray origin from column 3
and rotates screen-space direction ``(sx, sy, -1)`` by the rotation block
(src/render.cl:498-516).  fov enters as ``fov_scale = tan(fov/2)``
(src/main.cpp:111-112).
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, normalize
from . import rng


def camera_rotation(yaw, pitch):
    """3x3 rotation RotY(yaw) @ RotX(pitch), glm::eulerAngleYXZ(yaw,pitch,0)
    acting on column vectors.  Returned as a tuple of 9 scalars (row-major)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    # RotY @ RotX:
    # [ cy, sy*sp, sy*cp]
    # [  0,    cp,   -sp]
    # [-sy, cy*sp, cy*cp]
    return (
        cy, sy * sp, sy * cp,
        jnp.zeros_like(cy), cp, -sp,
        -sy, cy * sp, cy * cp,
    )


def rotate_vec(rot, v: Vec3) -> Vec3:
    """Apply a row-major 3x3 (as 9 scalars) to a Vec3 of arrays."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = rot
    return Vec3(
        m00 * v.x + m01 * v.y + m02 * v.z,
        m10 * v.x + m11 * v.y + m12 * v.z,
        m20 * v.x + m21 * v.y + m22 * v.z,
    )


def tiled_pixel_order(width, band_height, tile):
    """Row-major pixel indices of a (band_height, width) band enumerated in
    tile-major order: all pixels of one (th, tw) screen tile are contiguous.
    A pure permutation — used to make ray blocks spatially coherent for the
    packet-culling kernel."""
    th, tw = tile
    if band_height % th or width % tw:
        raise ValueError(f"tile {tile} must divide band {band_height}x{width}")
    ids = jnp.arange(band_height * width, dtype=jnp.uint32)
    ids = ids.reshape(band_height // th, th, width // tw, tw)
    return ids.transpose(0, 2, 1, 3).reshape(-1)


def untile_pixels(values, width, band_height, tile):
    """Inverse of tiled_pixel_order for per-pixel arrays (P,) -> (P,)."""
    th, tw = tile
    v = values.reshape(band_height // th, width // tw, th, tw)
    return v.transpose(0, 2, 1, 3).reshape(-1)


def untile_image(img, tile):
    """(H, W, C) image whose FLAT pixel order is tile-major -> row-major.
    Works on numpy and jnp arrays (pure reshape/transpose)."""
    h, w, c = img.shape
    th, tw = tile
    v = img.reshape(h // th, w // tw, th, tw, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def tile_image(img, tile):
    """Inverse of untile_image: row-major (H, W, C) -> tile-major flat
    order (stored back in the same (H, W, C) container)."""
    h, w, c = img.shape
    th, tw = tile
    v = img.reshape(h // th, th, w // tw, tw, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def generate_rays(width, height, num_samples, time, camera_pos: Vec3, rot,
                  aspect_ratio, fov_scale, row0=0, tile_height=None,
                  tile=None):
    """Jittered primary rays for the (tile_height*W*num_samples,) ray grid.

    Mirrors the sample loop of ``__kernel render`` (render.cl:495-516):
      seed  = (sample + id*num_samples) * time * 5304
      ndc   = ((px + u1)/W, (py + u2)/H)
      screen= ((2ndc.x-1)*aspect*fov_scale, (1-2ndc.y)*fov_scale)
      dir   = normalize(R @ (screen, -1));  origin = camera position

    `row0`/`tile_height` select a horizontal band of the image (row0 may be
    traced — it carries the per-device offset under shard_map); pixel ids and
    therefore RNG streams are GLOBAL, so a sharded render is bit-identical
    to the single-chip one.  Ray i is laid out as local_pixel * num_samples
    + sample.  Returns (origin Vec3, dir Vec3, seed uint32 array).
    """
    if tile_height is None:
        tile_height = height
    n_pix = width * tile_height
    if tile is not None:
        local = tiled_pixel_order(width, tile_height, tile)
    else:
        local = jnp.arange(n_pix, dtype=jnp.uint32)
    pixel_id = local + jnp.uint32(row0) * jnp.uint32(width)
    px = (pixel_id % jnp.uint32(width)).astype(jnp.float32)
    py = (pixel_id // jnp.uint32(width)).astype(jnp.float32)

    # expand to samples: index = id * S + sample
    sample = jnp.arange(num_samples, dtype=jnp.uint32)
    seed = rng.pixel_seed(sample[None, :], pixel_id[:, None], num_samples, time)
    seed = seed.reshape(-1)
    px = jnp.repeat(px, num_samples)
    py = jnp.repeat(py, num_samples)

    seed, u1 = rng.next_uniform(seed)
    seed, u2 = rng.next_uniform(seed)

    ndc_x = (px + u1) / jnp.float32(width)
    ndc_y = (py + u2) / jnp.float32(height)
    sx = (2.0 * ndc_x - 1.0) * jnp.float32(aspect_ratio) * jnp.float32(fov_scale)
    sy = (1.0 - 2.0 * ndc_y) * jnp.float32(fov_scale)

    d = normalize(rotate_vec(rot, Vec3(sx, sy, jnp.full_like(sx, -1.0))))
    n_rays = n_pix * num_samples
    o = Vec3(
        jnp.broadcast_to(camera_pos.x, (n_rays,)),
        jnp.broadcast_to(camera_pos.y, (n_rays,)),
        jnp.broadcast_to(camera_pos.z, (n_rays,)),
    )
    return o, d, seed
