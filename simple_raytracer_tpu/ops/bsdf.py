"""Stochastic material interaction as a branch-free select lattice.

Mirrors the material section of ``trace`` (render.cl:406-462) exactly,
including its behavioral quirks (SURVEY "parity traps"):
  - cosine-weighted bounce = normalize(normal + hemisphere_dir) where the
    hemisphere dir is sign-flipped onto the normal's side (render.cl:421)
  - Bernoulli trials on metallic / specular / transmittance (424-429)
  - specular reflection is untinted, metallic/diffuse tinted (436)
  - refraction direction derives from reflect(rough_dir, normal) — i.e.
    roughness perturbs refraction (440)
  - Schlick reflectance + total internal reflection (442-458); the Schlick
    uniform is only consumed when transparent AND not TIR (C's `||`
    short-circuit at 446-447), which the seed select reproduces
  - shadow-acne offset of 0.001 along the normal, sign following the new
    ray direction (462)

The per-bounce RNG draw order is the reference's fixed order: 6 uniforms for
the hemisphere direction, then metallic, specular, transmittance, [Schlick].
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vec import Vec3, dot, normalize, reflect, mix, where as vwhere, length_squared
from .scene_types import MaterialsSoA
from . import rng


class MaterialSample(NamedTuple):
    origin: Vec3          # new ray origin (acne-offset)
    direction: Vec3       # new unit ray direction
    mask_mul: Vec3        # multiplier applied to the path throughput
    seed: jnp.ndarray     # advanced RNG state


def shlick_reflectance(mu, cos_theta):
    """Mirrors shlick_reflectance (render.cl:173-178)."""
    r0 = (1.0 - mu) / (1.0 + mu)
    r0 = r0 * r0
    m = 1.0 - cos_theta
    m2 = m * m
    return r0 + (1.0 - r0) * (m2 * m2 * m)


class MatFields(NamedTuple):
    smoothness: jnp.ndarray
    metallic: jnp.ndarray
    specular: jnp.ndarray
    emission_strength: jnp.ndarray
    transmittance: jnp.ndarray
    refraction_index: jnp.ndarray
    color: Vec3
    emission: Vec3


def gather_materials(materials: MaterialsSoA, idx: jnp.ndarray) -> MatFields:
    """Per-ray material field gather by (R,) index array.

    All 12 fields fetched with ONE transposed one-hot MXU matmul into
    (12, R) — per-field dynamic gathers are element-serial on TPU when the
    table is a jit argument, and an (R, F) result's column slices each
    re-scan the lane-padded buffer (see ops.gather)."""
    from .gather import table_gather_t

    table = jnp.stack([
        materials.smoothness, materials.metallic, materials.specular,
        materials.emission_strength, materials.transmittance,
        materials.refraction_index,
        materials.color.x, materials.color.y, materials.color.z,
        materials.emission.x, materials.emission.y, materials.emission.z,
    ], axis=-1)
    rows = table_gather_t(table, idx)           # (12, R)
    return MatFields(
        smoothness=rows[0],
        metallic=rows[1],
        specular=rows[2],
        emission_strength=rows[3],
        transmittance=rows[4],
        refraction_index=rows[5],
        color=Vec3(rows[6], rows[7], rows[8]),
        emission=Vec3(rows[9], rows[10], rows[11]),
    )


def sample_material(position: Vec3, normal: Vec3, front: jnp.ndarray,
                    in_dir: Vec3, mat: MatFields,
                    seed: jnp.ndarray) -> MaterialSample:
    """One stochastic material interaction for every ray in the batch.

    `normal` must already be flipped toward the ray; `front` is the pre-flip
    orientation flag driving the IOR ratio (render.cl:442).
    """
    seed, hemi = rng.next_direction_hemisphere(normal, seed)
    random_dir = normalize(normal + hemi)
    reflected_dir = reflect(in_dir, normal)

    seed, u_metal = rng.next_uniform(seed)
    seed, u_spec = rng.next_uniform(seed)
    is_metallic = mat.metallic > u_metal
    is_specular = mat.specular > u_spec

    rough_dir = mix(random_dir, reflected_dir, mat.smoothness)

    seed, u_trans = rng.next_uniform(seed)
    is_transparent = mat.transmittance > u_trans
    seed_opaque = seed

    # ---- opaque branch (render.cl:431-436) ----
    mirror_like = (is_metallic | is_specular).astype(jnp.float32)
    dir_opaque = mix(random_dir, rough_dir, mirror_like)
    one = Vec3.full(1.0)
    mask_opaque = mix(mat.color, one, is_specular.astype(jnp.float32))

    # ---- transparent branch (render.cl:437-459) ----
    refl_smooth = reflect(rough_dir, normal)
    mu = jnp.where(front, 1.0 / mat.refraction_index, mat.refraction_index)
    cos_theta = jnp.minimum(1.0, dot(refl_smooth, -normal))
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    tir = mu * sin_theta > 1.0
    seed_schlick, u_schlick = rng.next_uniform(seed)
    # Schlick draw only consumed when NOT TIR (`||` short-circuit, 446-447)
    seed_transparent = jnp.where(tir, seed, seed_schlick)
    reflected_trans = tir | (shlick_reflectance(mu, cos_theta) > u_schlick)

    out_perp = (refl_smooth + normal * cos_theta) * mu
    out_parallel = normal * (-jnp.sqrt(jnp.abs(1.0 - length_squared(out_perp))))
    refracted_dir = out_perp + out_parallel

    dir_trans = vwhere(reflected_trans, rough_dir, refracted_dir)
    mask_trans = vwhere(reflected_trans, one, mat.color)

    # ---- combine ----
    new_dir = normalize(vwhere(is_transparent, dir_trans, dir_opaque))
    mask_mul = vwhere(is_transparent, mask_trans, mask_opaque)
    seed = jnp.where(is_transparent, seed_transparent, seed_opaque)

    origin = position + normal * (jnp.sign(dot(normal, new_dir)) * 0.001)
    return MaterialSample(origin=origin, direction=new_dir,
                          mask_mul=mask_mul, seed=seed)
