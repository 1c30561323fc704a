"""The path-trace core: fixed-depth masked bounce loop + progressive step.

This is the TPU-native re-architecture of the reference megakernel
(``__kernel render`` + ``trace``, render.cl:396-523).  Divergent per-ray
control flow becomes a ``lax.scan`` over the bounce index carrying dense
(R,) ray state with an alive mask — no breaks, only masked updates:

  - emission added on every hit before the bounce decision (render.cl:413)
  - last bounce adds emission only, no new ray (render.cl:415-416)
  - miss: color += mask * sky, ray dies (render.cl:463-467)
  - show_normals debug mode renders n*0.5+0.5 on first hit (render.cl:407-410)

The whole (H, W, S) ray grid advances in lockstep; sample-major layout
(ray index = pixel_id * S + sample) keeps the per-pixel reduction a cheap
reshape + mean at the end (render.cl:520-522 divides by num_samples and
accumulates into the canvas).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .vec import Vec3, where as vwhere
from .scene_types import DeviceScene
from .intersect import closest_hit
from .bsdf import gather_materials, sample_material
from .sky import sky_color
from .camera import camera_rotation, generate_rays, untile_pixels


class CameraState(NamedTuple):
    """Traced camera parameters — moving the camera never recompiles.

    Mirrors Camera (helper.hpp:16-31) + the fov/aspect render options
    (main.cpp:111-112, tracer.hpp:56-60)."""
    position: Vec3       # scalar components
    yaw: jnp.ndarray
    pitch: jnp.ndarray
    aspect_ratio: jnp.ndarray
    fov_scale: jnp.ndarray


def _fused_ok(scene: DeviceScene, tri_backend: str,
              show_normals: bool) -> bool:
    """The fused Pallas bounce kernel serves a scene when it is either
    triangle-free or BVH-clustered (the dense small-mesh path has no
    (20, R) triangle rows to feed it).  Auto-selected on TPU; "fused"
    forces it (tests run it in interpret mode elsewhere)."""
    if show_normals:
        return False
    has_tris = scene.triangles.material.shape[0] > 0
    capable = (not has_tris) or scene.triangles.clusters is not None
    if tri_backend == "fused":
        # trace_rays_fused dereferences scene.triangles.clusters for any
        # mesh scene; a mid-size mesh (above SMALL_TRIS_MAX, below the
        # cluster threshold) has clusters=None, so honoring "fused" there
        # would crash — fall back to the scan path instead.
        return capable
    if tri_backend != "auto" or jax.default_backend() != "tpu":
        return False
    if capable and scene.triangles.clusters is not None:
        # Large BVH meshes (the only scenes that reach trace_rays under
        # "auto" on TPU — everything smaller took the megakernel in
        # render_pass): the XLA scan body measured FASTER than the fused
        # per-bounce Pallas bounce kernel at this scale (62.3 vs 56.5
        # Mrays/s on config 6, scripts/sweep_config6.py on v5e), so
        # route them to the scan path; "fused" above still forces this
        # form for tests and sweeps.
        from .pallas.bvh_kernel import VMEM_TABLE_MAX_SLOTS
        if scene.triangles.clusters.table_t.shape[0] > VMEM_TABLE_MAX_SLOTS:
            return False
    return capable


def trace_rays_fused(scene: DeviceScene, o: Vec3, d: Vec3,
                     seed: jnp.ndarray, num_bounces: int,
                     block_r: int = 1536, bvh_block_r: int = 1536,
                     interpret: bool = False) -> Vec3:
    """trace_rays with the whole bounce body fused into one Pallas kernel
    per bounce (ops/pallas/bounce_kernel.py): the (20, R) ray state rides
    VMEM once per bounce and blocks whose rays are all dead are skipped.
    Segment semantics are identical to the scan path below."""
    from .intersect import intersect_spheres, intersect_planes
    from .pallas.bounce_kernel import (make_state, unpack_state,
                                       prim_tables, bounce_step)

    n = o.x.shape[0]
    state = make_state(o, d, seed, block_r)
    sph_tab, pln_tab, mat_tab = prim_tables(scene)
    has_tris = scene.triangles.material.shape[0] > 0
    cl = scene.triangles.clusters

    def body(state, i):
        is_last = (i == jnp.int32(num_bounces - 1)).astype(jnp.int32)
        tri_rows = None
        if has_tris:
            ro = Vec3(state[0], state[1], state[2])
            rd = Vec3(state[3], state[4], state[5])
            # slim best-t from the dense primitives seeds the BVH slab far
            # bound (argmin halves are dead-code-eliminated by XLA)
            t_seed = jnp.full_like(state[0], jnp.inf)
            if scene.spheres.radius.shape[0]:
                t_s, _ = intersect_spheres(ro, rd, scene.spheres)
                t_seed = jnp.minimum(t_seed, t_s)
            if scene.planes.material.shape[0]:
                t_p, _ = intersect_planes(ro, rd, scene.planes)
                t_seed = jnp.minimum(t_seed, t_p)
            from .intersect import resolve_compact_cap
            from .pallas.bvh_kernel import (intersect_triangles_bvh,
                                            intersect_triangles_bvh_compact,
                                            maybe_sub_aabb)
            sub, sdiv = maybe_sub_aabb(cl)
            cap = resolve_compact_cap(n, None)
            kw = dict(block_r=bvh_block_r, with_attrs=True,
                      interpret=interpret, table_tr=cl.table_tr,
                      sub_aabb=sub, sub_div=sdiv)
            if cap:
                t_t, _, attrs = intersect_triangles_bvh_compact(
                    ro, rd, state[7], t_seed, cl.aabb, cl.table_t,
                    cap=cap, **kw)
            else:
                t_t, _, attrs = intersect_triangles_bvh(
                    ro, rd, state[7], t_seed, cl.aabb, cl.table_t, **kw)
            tri_rows = jnp.concatenate([t_t[None], attrs], axis=0)
        state = bounce_step(state, is_last, sph_tab, pln_tab, mat_tab,
                            tri_rows=tri_rows, block_r=block_r,
                            interpret=interpret)
        return state, None

    state, _ = jax.lax.scan(body, state, jnp.arange(num_bounces))
    color, sky_mask, sky_dir = unpack_state(state, n)
    skyc = sky_color(sky_dir, scene.sky, scene.skybox)
    return color + sky_mask * skyc


def trace_rays(scene: DeviceScene, o: Vec3, d: Vec3, seed: jnp.ndarray,
               num_bounces: int, show_normals: bool = False,
               tri_chunk: int = 256, tri_backend: str = "auto") -> Vec3:
    """Trace the (R,) ray batch to completion; returns per-ray radiance."""
    if _fused_ok(scene, tri_backend, show_normals):
        # interpret-mode Pallas off-TPU (same auto-selection render_pass
        # makes for the megakernel): a forced tri_backend="fused" on CPU
        # would otherwise hit Mosaic lowering and fail to compile
        return trace_rays_fused(scene, o, d, seed, num_bounces,
                                interpret=jax.default_backend() != "tpu")
    n = o.x.shape[0]
    zeros = jnp.zeros((n,), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    color = Vec3(zeros, zeros, zeros)
    mask = Vec3(ones, ones, ones)
    alive = jnp.ones((n,), bool)
    # Deferred environment term: each ray misses AT MOST once (the miss path
    # terminates it, render.cl:463-467), so instead of sampling the skybox
    # inside every bounce we record (direction, throughput) at the miss and
    # evaluate the expensive equirect sample ONCE after the scan.  Exactly
    # equivalent to the reference's  mask *= sky; color += mask.
    sky_mask = Vec3(zeros, zeros, zeros)
    sky_dir = Vec3(zeros, zeros, ones)

    # In show_normals mode every ray terminates on its first segment
    # (render.cl:407-410 breaks on hit; the miss path also breaks).
    effective_bounces = 1 if show_normals else num_bounces

    def body(carry, i, compact=None):
        o, d, color, mask, seed, alive, sky_mask, sky_dir = carry
        hit = closest_hit(scene, o, d, tri_chunk=tri_chunk,
                          tri_backend=tri_backend, alive=alive,
                          compact=compact)
        h_alive = alive & hit.hit
        m_alive = alive & (~hit.hit)

        sky_mask = vwhere(m_alive, mask, sky_mask)
        sky_dir = vwhere(m_alive, d, sky_dir)

        if show_normals:
            # First-hit AOV modes, all single-segment like the
            # reference's show-normals toggle (render.cl:407-410):
            # True/"normals" = n*0.5+0.5 (misses show sky, exactly the
            # reference's fallthrough); "depth" = 1/(1+t) grayscale
            # (miss -> t=inf -> exactly 0, sky suppressed); "albedo" =
            # the hit material's color (misses show sky, the surface-
            # less analog).
            mode = "normals" if show_normals is True else show_normals
            if mode == "normals":
                val = hit.normal * 0.5 + 0.5
            elif mode == "depth":
                g = 1.0 / (1.0 + hit.t)
                val = Vec3(g, g, g)
                z = jnp.zeros_like(o.x)
                sky_mask = vwhere(m_alive, Vec3(z, z, z), sky_mask)
            elif mode == "albedo":
                val = gather_materials(scene.materials, hit.material).color
            else:
                raise ValueError(f"unknown AOV mode {show_normals!r}")
            color = vwhere(h_alive, val, color)
            dead = alive & jnp.zeros_like(alive)
            return (o, d, color, mask, seed, dead, sky_mask, sky_dir), None

        mat = gather_materials(scene.materials, hit.material)
        emission = mask * mat.emission * mat.emission_strength
        color = vwhere(h_alive, color + emission, color)

        is_last = i == jnp.int32(num_bounces - 1)
        cont = h_alive & (~is_last)

        ms = sample_material(hit.position, hit.normal, hit.front, d, mat, seed)
        o = vwhere(cont, ms.origin, o)
        d = vwhere(cont, ms.direction, d)
        mask = vwhere(cont, mask * ms.mask_mul, mask)
        seed = jnp.where(cont, ms.seed, seed)
        return (o, d, color, mask, seed, cont, sky_mask, sky_dir), None

    carry = (o, d, color, mask, seed, alive, sky_mask, sky_dir)
    # Bounce 0 is PEELED out of the scan so the two regimes get different
    # BVH routing: camera rays are coherent and all alive — the dense
    # kernel's pixel-tile blocks + front-to-back early exit already win
    # there, and the compact wrapper's sort/gather/scatter is pure
    # overhead (21.9 vs 14.1 ms measured on the 82K-tri bench at 1080p,
    # scripts/bench_compact_parts.py).  Secondary bounces are SPARSE
    # (<4% of rays admit any supercluster, scripts/measure_compact.py)
    # and default to ray compaction (closest_hit compact="auto"; the
    # SRT_BVH_COMPACT env knob still overrides BOTH regimes for sweeps).
    # Together: config 6 84.4->76 ms class, see TODO.md Performance.
    # EXCEPTION (round 5): when the triangle table STREAMS from HBM the
    # cost model flips — the dense peel pays a full-grid prepass (22 ms
    # at 1080p on the 1.31M-tri config 7) plus per-visit DMA for every
    # pixel-tile block that grazes the mesh, while camera-ray admission
    # is tiny (~3%), so the compacted kernel touches ~5% of the rays.
    # VMEM-resident tables (config 6) keep the dense peel.
    b0_compact = None
    if tri_backend in ("auto", "bvh", "clustered"):
        from .intersect import _tri_backend_auto
        from .pallas.bvh_kernel import table_streams_hbm
        resolved = (_tri_backend_auto(scene) if tri_backend == "auto"
                    else tri_backend)
        if resolved in ("bvh", "clustered") and table_streams_hbm(
                scene.triangles.clusters):
            b0_compact = "auto"
    carry, _ = body(carry, jnp.int32(0), compact=b0_compact)
    if effective_bounces > 1:
        carry, _ = jax.lax.scan(functools.partial(body, compact="auto"),
                                carry, jnp.arange(1, effective_bounces))
    color, sky_mask, sky_dir = carry[2], carry[6], carry[7]
    skyc = sky_color(sky_dir, scene.sky, scene.skybox)
    return color + sky_mask * skyc


def render_pass(scene: DeviceScene, camera: CameraState, canvas: jnp.ndarray,
                time: jnp.ndarray, *, width: int, height: int,
                num_samples: int, num_bounces: int,
                show_normals: bool = False, tri_chunk: int = 256,
                tri_backend: str = "auto", ray_tile=None, row0=0,
                tile_height: int = None,
                canvas_tiled: bool = False) -> jnp.ndarray:
    """One progressive sample pass: trace S jittered samples per pixel and
    accumulate the per-pixel mean into the canvas (render.cl:483-523).

    canvas: (tile_height, W, 3) f32 running radiance sum (the full image
    when row0/tile_height are defaulted; one device's horizontal band under
    shard_map).  Returns the new canvas.

    canvas_tiled=True keeps the canvas in the ray_tile pixel order — the
    per-step untile permutation (~1.4 ms at 1080p) moves to image-fetch
    time (tonemapping is per-pixel, so the order never matters until a
    human looks).  The engine owns the convention; external callers get
    row-major canvases by default.
    """
    if tile_height is None:
        tile_height = height
    rot = camera_rotation(camera.yaw, camera.pitch)
    from .pallas.bounce_kernel import (SMALL_TRIS_MAX,
                                       MEGA_PACKED_MAX_CLUSTERS)
    from .pallas.bvh_kernel import VMEM_TABLE_MAX_SLOTS
    n_tris = scene.triangles.material.shape[0]
    cl = scene.triangles.clusters
    mega_tris = (n_tris == 0
                 or (n_tris <= SMALL_TRIS_MAX and cl is None)
                 or (cl is not None
                     and cl.table_t.shape[0] <= VMEM_TABLE_MAX_SLOTS))
    if tri_backend == "fused":
        # a forced megakernel additionally serves large meshes from the
        # VMEM-resident PACKED table (in-kernel BVH).  MEASURED SLOWER
        # than the split path at 82K tris (23.8 vs 58.8 Mrays/s,
        # scripts/sweep_config6.py on v5e): the in-kernel group scan
        # re-traverses per bounce without the dense XLA prepass or the
        # per-sub-block MT gating, so "auto" routes big meshes to the
        # split per-bounce path below and "fused" keeps this form
        # reachable for tests and regression sweeps.
        from .pallas.bvh_kernel import _TROWS
        mega_tris = mega_tris or (
            cl is not None and cl.table_tr is not None
            and cl.table_tr.shape[1] == _TROWS   # single-packet (K<=128)
            and cl.table_tr.shape[0] <= MEGA_PACKED_MAX_CLUSTERS)
    use_mega = (not show_normals and mega_tris
                and tri_backend in ("auto", "fused")
                and (tri_backend == "fused"
                     or jax.default_backend() == "tpu"))
    if use_mega:
        # raygen + every bounce + environment in ONE Pallas call — ray
        # state never leaves VMEM (ops/pallas/bounce_kernel.py)
        from .pallas.bounce_kernel import trace_full_fused
        interp = jax.default_backend() != "tpu"
        color = trace_full_fused(
            scene, rot, camera.position, camera.aspect_ratio,
            camera.fov_scale, time, width=width, height=height,
            num_samples=num_samples, num_bounces=num_bounces, row0=row0,
            tile_height=tile_height, ray_tile=ray_tile, interpret=interp)
    else:
        o, d, seed = generate_rays(width, height, num_samples, time,
                                   camera.position, rot,
                                   camera.aspect_ratio, camera.fov_scale,
                                   row0=row0, tile_height=tile_height,
                                   tile=ray_tile)
        color = trace_rays(scene, o, d, seed, num_bounces,
                           show_normals=show_normals, tri_chunk=tri_chunk,
                           tri_backend=tri_backend)

    inv_s = jnp.float32(1.0 / num_samples)

    def per_pixel(c):
        p = c.reshape(tile_height * width, num_samples).sum(axis=1) * inv_s
        if ray_tile is not None and not canvas_tiled:
            p = untile_pixels(p, width, tile_height, ray_tile)
        return p

    frame = jnp.stack(
        [per_pixel(color.x), per_pixel(color.y), per_pixel(color.z)],
        axis=-1,
    ).reshape(tile_height, width, 3)
    return canvas + frame


@functools.lru_cache(maxsize=64)
def make_render_step(width: int, height: int, num_samples: int,
                     num_bounces: int, show_normals: bool = False,
                     tri_chunk: int = 256, tri_backend: str = "auto",
                     ray_tile=None, donate_canvas: bool = True,
                     jit: bool = True, canvas_tiled: bool = False):
    """Build the jitted progressive step fn: (scene, camera, canvas, time) ->
    canvas.  Static shape config is baked in (the jit cache key), the moral
    equivalent of the reference's one-time kernel build (tracer.cpp:21-26).
    Memoized so renderers with identical configs share one compiled step."""
    fn = functools.partial(
        render_pass, width=width, height=height, num_samples=num_samples,
        num_bounces=num_bounces, show_normals=show_normals,
        tri_chunk=tri_chunk, tri_backend=tri_backend, ray_tile=ray_tile,
        canvas_tiled=canvas_tiled,
    )
    if not jit:
        return fn
    donate = (2,) if donate_canvas else ()
    return jax.jit(fn, donate_argnums=donate)
