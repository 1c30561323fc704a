"""Round-4 decision gate for the granule coherence sort (the
persistent-queue redesign of the large-mesh path, VERDICT item 1).

On config 6's REAL per-bounce ray states (82K-tri sculpt + plane, 1080p,
1spp, 4 bounces), count the (128-ray sub-block, cluster) Moller-Trumbore
pairs the BVH kernel pays per bounce:

  - in the current (8, 64) pixel-tile ray order,
  - after a 16-ray-granule coherence sort (granules permuted by the
    front-to-back rank of the first supercluster each granule admits),
  - after the same sort at 128-ray granularity (sub-block-aligned, the
    cheapest possible permute),

against two bounds:

  - ray-level admitted pairs under the incoming t_seed (what perfectly
    ray-dense MT batches would pay before any early-out), and
  - ray-level pairs under the FINAL per-ray t (the floor a perfect
    front-to-back traversal with ideal early termination approaches).

MT wall time is ~0.2 us per (sub-block, cluster) pair (TODO.md cost
split), so `pairs * 0.2us` converts any row to a step-time estimate.
The sort itself is result-neutral: intersection winners are a global
(t, lowest-index) argmin, independent of ray order.

Usage: python scripts/measure_admission.py   (on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.vec import Vec3, where as vwhere
from simple_raytracer_tpu.ops.intersect import (closest_hit,
                                                intersect_spheres,
                                                intersect_planes)
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.pallas.bvh_kernel import (_union_boxes8,
                                                        _SUPER)

W, H, S, BOUNCES = 1920, 1080, 1, 4
BLOCK_R = 1536
SUB = 128
GRAN = 16
CHUNK = BLOCK_R * 50          # rays per stats chunk (27 chunks at 1080p)


def slab_maybe(aabb, ox, oy, oz, inx, iny, inz, live, tfar):
    """(C, Rc) closed-interval slab admission, exactly the kernel's
    semantics (_visit_prepass): NaN conservative, near >= 1e38 rejects
    sentinel boxes, far capped by the per-ray bound."""
    col = lambda j: aabb[:, j][:, None]
    t1x = (col(0) - ox) * inx
    t2x = (col(3) - ox) * inx
    t1y = (col(1) - oy) * iny
    t2y = (col(4) - oy) * iny
    t1z = (col(2) - oz) * inz
    t2z = (col(5) - oz) * inz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                  jnp.maximum(t1y, t2y)),
                      jnp.minimum(jnp.maximum(t1z, t2z), tfar))
    return jnp.logical_not((near > far) | (near >= 1.0e38)) & live


@jax.jit
def chunk_stats(aabb, ox, oy, oz, dx, dy, dz, alive, tfar):
    """Per-chunk admission reductions for ONE ray order."""
    maybe = slab_maybe(aabb, ox[None], oy[None], oz[None],
                       1.0 / dx[None], 1.0 / dy[None], 1.0 / dz[None],
                       alive[None], tfar[None])
    c, r = maybe.shape
    ray_pairs = jnp.sum(maybe, dtype=jnp.int32)
    sub = maybe.reshape(c, r // SUB, SUB).any(axis=2)
    sub_pairs = jnp.sum(sub, dtype=jnp.int32)
    blk = maybe.reshape(c, r // BLOCK_R, BLOCK_R).any(axis=2)
    blk_pairs = jnp.sum(blk, dtype=jnp.int32)
    zero_blocks = jnp.sum(~blk.any(axis=0), dtype=jnp.int32)
    return ray_pairs, sub_pairs, blk_pairs, zero_blocks


@jax.jit
def ray_keys(super_aabb, rank, ox, oy, oz, dx, dy, dz, alive, tfar):
    """Per-ray sort key: front-to-back rank of the first admitted
    supercluster (misses and dead rays sort last)."""
    maybe = slab_maybe(super_aabb, ox[None], oy[None], oz[None],
                       1.0 / dx[None], 1.0 / dy[None], 1.0 / dz[None],
                       alive[None], tfar[None])
    n_super = super_aabb.shape[0]
    return jnp.min(jnp.where(maybe, rank[:, None], n_super), axis=0)


def front_to_back_rank(boxes, o, alive):
    w = alive.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    origin = jnp.stack([jnp.sum(o.x * w), jnp.sum(o.y * w),
                        jnp.sum(o.z * w)]) / wsum
    centers = (boxes[:, 0:3] + boxes[:, 3:6]) * 0.5
    d2 = jnp.sum((centers - origin[None, :]) ** 2, axis=1)
    order = jnp.argsort(d2)
    n = boxes.shape[0]
    return jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))


def full_stats(aabb, o, d, alive, tfar, label):
    tot = np.zeros(4, np.int64)
    n = o.x.shape[0]
    for s in range(0, n, CHUNK):
        sl = slice(s, s + CHUNK)
        out = chunk_stats(aabb, o.x[sl], o.y[sl], o.z[sl],
                          d.x[sl], d.y[sl], d.z[sl], alive[sl], tfar[sl])
        tot += np.array([int(v) for v in out])
    print(f"    {label:28s} ray_pairs={tot[0]:>12,} sub128={tot[1]:>10,} "
          f"blk1536={tot[2]:>8,} zero_blk={tot[3]:>6,}  "
          f"mt_est={tot[1] * 0.2e-3:7.1f} ms", flush=True)
    return tot


def permute(v, perm_rays):
    return jnp.take(v, perm_rays, axis=0)


def main():
    scene, camera, _ = CONFIGS[6]()
    opt = RenderOptions(width=W, height=H, num_samples=S,
                        num_bounces=BOUNCES)
    r = Renderer(opt, scene=scene)
    dscene = r._device_scene
    cl = dscene.triangles.clusters
    aabb = np.asarray(cl.aabb)
    n_clusters = aabb.shape[0]
    print(f"clusters={n_clusters}  table_t={cl.table_t.shape}", flush=True)

    c_pad = ((n_clusters + _SUPER - 1) // _SUPER) * _SUPER
    sent = np.full((c_pad - n_clusters, 8), 3.0e38, np.float32)
    sent[:, 6:] = 0.0
    aabb_pad = jnp.asarray(np.concatenate([aabb, sent], axis=0))
    super_aabb = _union_boxes8(aabb_pad.reshape(-1, _SUPER, 8))
    aabb_j = jnp.asarray(aabb)
    print(f"supers={super_aabb.shape[0]}", flush=True)

    cam_state = camera.state(W / H)
    rot = camera_rotation(cam_state.yaw, cam_state.pitch)
    o, d, seed = generate_rays(W, H, S, jnp.uint32(7), cam_state.position,
                               rot, cam_state.aspect_ratio,
                               cam_state.fov_scale, tile=(8, 64))
    n = o.x.shape[0]
    alive = jnp.ones((n,), bool)

    for bounce in range(BOUNCES):
        t0 = time.time()
        t_s, _ = intersect_spheres(o, d, dscene.spheres) \
            if dscene.spheres.radius.shape[0] else (jnp.full((n,), jnp.inf), None)
        t_p, _ = intersect_planes(o, d, dscene.planes) \
            if dscene.planes.material.shape[0] else (jnp.full((n,), jnp.inf), None)
        t_seed = jnp.minimum(t_s, t_p)

        hit = closest_hit(dscene, o, d, tri_backend="bvh", alive=alive)
        t_final = hit.t
        live = int(jnp.sum(alive))
        print(f"bounce {bounce}: live={live:,}", flush=True)

        # current pixel-tile order
        full_stats(aabb_j, o, d, alive, t_seed, "orig(seed)")
        # granule sorts
        rank = front_to_back_rank(super_aabb, o, alive)
        keys = ray_keys(super_aabb, rank, o.x, o.y, o.z, d.x, d.y, d.z,
                        alive, t_seed)
        for gran in (GRAN, SUB):
            gkey = keys.reshape(-1, gran).min(axis=1)
            gperm = jnp.argsort(gkey)
            perm_rays = (gperm[:, None] * gran
                         + jnp.arange(gran, dtype=gperm.dtype)[None, :]
                         ).reshape(-1)
            po = Vec3(permute(o.x, perm_rays), permute(o.y, perm_rays),
                      permute(o.z, perm_rays))
            pd = Vec3(permute(d.x, perm_rays), permute(d.y, perm_rays),
                      permute(d.z, perm_rays))
            full_stats(aabb_j, po, pd, permute(alive, perm_rays),
                       permute(t_seed, perm_rays), f"sorted(g{gran},seed)")
        # floor: perfect early termination (far = final t)
        full_stats(aabb_j, o, d, alive, t_final, "orig(final-t floor)")
        print(f"  [{time.time() - t0:.1f} s]", flush=True)

        # advance state exactly like trace_rays' body
        h_alive = alive & hit.hit
        mat = gather_materials(dscene.materials, hit.material)
        is_last = bounce == BOUNCES - 1
        cont = h_alive & (not is_last)
        ms = sample_material(hit.position, hit.normal, hit.front, d, mat,
                             seed)
        o = vwhere(cont, ms.origin, o)
        d = vwhere(cont, ms.direction, d)
        seed = jnp.where(cont, ms.seed, seed)
        alive = cont


if __name__ == "__main__":
    main()
