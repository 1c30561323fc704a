"""Round-4 sizing gate for the compact-then-trace BVH path (VERDICT
item 1).

On config 6's real per-bounce ray states (82K-tri sculpt + plane, 1080p,
1spp, 4 bounces), measure what an XLA-level ray compaction would see:

  - rays admitting >= 1 SUPERCLUSTER (48 boxes; the cheap 0.16 ms
    admission the wrapper would run) -> sizes the static capacity CAP,
  - rays admitting >= 1 CLUSTER (768 boxes) -> the tight lower bound,
  - (sub128, cluster) MT pairs of the compacted prefix after a stable
    sort by front-to-back rank of the first admitted supercluster,
    with and without a near-t secondary key -> predicts the MT cost of
    the compacted kernel invocation (0.5 us per pair, the calibrated
    rate: round-3 measured ~90 ms MT over ~176K pairs).

Usage: python scripts/measure_compact.py   (on the TPU)
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
SUB = 128
US_PER_PAIR = 0.5


def slab_maybe(aabb, ox, oy, oz, inx, iny, inz, live, tfar):
    """(C, Rc) closed-interval slab admission, exactly _visit_prepass's
    semantics. Also returns near for the secondary sort key."""
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
    return (jnp.logical_not((near > far) | (near >= 1.0e38)) & live), near


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


CHUNK = 1536 * 50


@jax.jit
def cluster_chunk_stats(aabb, ox, oy, oz, dx, dy, dz, alive, tfar):
    """Chunked (C, Rc) cluster admission -> (admitting rays, sub pairs,
    ray pairs)."""
    maybe, _ = slab_maybe(aabb, ox[None], oy[None], oz[None],
                          1.0 / dx[None], 1.0 / dy[None], 1.0 / dz[None],
                          alive[None], tfar[None])
    c, r = maybe.shape
    sub = maybe.reshape(c, r // SUB, SUB).any(axis=2)
    return (jnp.sum(maybe.any(axis=0), dtype=jnp.int32),
            jnp.sum(sub, dtype=jnp.int32),
            jnp.sum(maybe, dtype=jnp.int32))


@jax.jit
def cluster_first_key(aabb, crank, ox, oy, oz, dx, dy, dz, alive, tfar):
    maybe, _ = slab_maybe(aabb, ox[None], oy[None], oz[None],
                          1.0 / dx[None], 1.0 / dy[None], 1.0 / dz[None],
                          alive[None], tfar[None])
    return jnp.min(jnp.where(maybe, crank[:, None], aabb.shape[0]), axis=0)


@jax.jit
def admit_stats(super_aabb, rank, o, d, alive, tfar):
    """Full-R pass over the 48 supers: (admit mask, first-super key,
    near-of-first-super)."""
    maybe, near = slab_maybe(super_aabb, o.x[None], o.y[None], o.z[None],
                             1.0 / d.x[None], 1.0 / d.y[None],
                             1.0 / d.z[None], alive[None], tfar[None])
    n_super = super_aabb.shape[0]
    key = jnp.min(jnp.where(maybe, rank[:, None], n_super), axis=0)
    admit = key < n_super
    # near of the FIRST (by rank) admitted super
    first_near = jnp.min(jnp.where(maybe & (rank[:, None] == key[None, :]),
                                   near, jnp.inf), axis=0)
    return admit, key, first_near


def compacted_pairs(aabb_j, o, d, alive, tfar, perm, n_admit, label):
    """(sub128, cluster) pairs of the first n_admit rays of `perm`,
    padded to a CHUNK multiple (pad rays admit nothing: dead)."""
    cap = int(-(-n_admit // CHUNK) * CHUNK)
    idx = perm[:cap]
    take = lambda v: jnp.take(v, idx, axis=0)
    po = Vec3(take(o.x), take(o.y), take(o.z))
    pd = Vec3(take(d.x), take(d.y), take(d.z))
    pal = take(alive) & (jnp.arange(cap) < n_admit)
    ptf = take(tfar)
    sub_pairs = ray_pairs = 0
    for s in range(0, cap, CHUNK):
        sl = slice(s, s + CHUNK)
        _, sp, rp = cluster_chunk_stats(aabb_j, po.x[sl], po.y[sl],
                                        po.z[sl], pd.x[sl], pd.y[sl],
                                        pd.z[sl], pal[sl], ptf[sl])
        sub_pairs += int(sp)
        ray_pairs += int(rp)
    print(f"    {label:34s} cap={cap:>8,} sub128={sub_pairs:>8,} "
          f"ray_pairs={ray_pairs:>10,} occ={ray_pairs / (sub_pairs * SUB + 1e-9):5.1%} "
          f"mt_est={sub_pairs * US_PER_PAIR * 1e-3:6.1f} ms", flush=True)


def main():
    scene, camera, _ = CONFIGS[6]()
    opt = RenderOptions(width=W, height=H, num_samples=S,
                        num_bounces=BOUNCES)
    r = Renderer(opt, scene=scene)
    dscene = r._device_scene
    cl = dscene.triangles.clusters
    aabb = np.asarray(cl.aabb)
    n_clusters = aabb.shape[0]

    c_pad = ((n_clusters + _SUPER - 1) // _SUPER) * _SUPER
    sent = np.full((c_pad - n_clusters, 8), 3.0e38, np.float32)
    sent[:, 6:] = 0.0
    aabb_pad = jnp.asarray(np.concatenate([aabb, sent], axis=0))
    super_aabb = _union_boxes8(aabb_pad.reshape(-1, _SUPER, 8))
    aabb_j = jnp.asarray(aabb)
    print(f"clusters={n_clusters} supers={super_aabb.shape[0]}", flush=True)

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
        live = int(jnp.sum(alive))

        rank = front_to_back_rank(super_aabb, o, alive)
        admit, key, first_near = admit_stats(super_aabb, rank, o, d,
                                             alive, t_seed)
        n_super_admit = int(jnp.sum(admit))
        # cluster-level admitting-ray count (the tight bound), chunked
        n_cl_admit = 0
        for s in range(0, n, CHUNK):
            sl = slice(s, s + CHUNK)
            na, _, _ = cluster_chunk_stats(aabb_j, o.x[sl], o.y[sl],
                                           o.z[sl], d.x[sl], d.y[sl],
                                           d.z[sl], alive[sl], t_seed[sl])
            n_cl_admit += int(na)
        print(f"bounce {bounce}: live={live:,} super_admit={n_super_admit:,} "
              f"cluster_admit={n_cl_admit:,}", flush=True)

        # primary key only (stable sort keeps pixel order inside buckets)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm1 = jax.lax.sort_key_val(key, iota)
        compacted_pairs(aabb_j, o, d, alive, t_seed, perm1, n_super_admit,
                        "sorted(first-super rank)")
        # composite key: rank * 256 + quantized near of first super
        near_q = jnp.clip((first_near * 8.0), 0, 255).astype(jnp.int32)
        key2 = key * 256 + jnp.where(admit, near_q, 0)
        _, perm2 = jax.lax.sort_key_val(key2, iota)
        compacted_pairs(aabb_j, o, d, alive, t_seed, perm2, n_super_admit,
                        "sorted(rank, near_q)")
        # rank + direction octant (3 sign bits): groups rays whose
        # traversal continues the same way after the shared first super
        octant = ((d.x < 0) * 4 + (d.y < 0) * 2 + (d.z < 0)).astype(jnp.int32)
        _, permo = jax.lax.sort_key_val(key * 8 + octant, iota)
        compacted_pairs(aabb_j, o, d, alive, t_seed, permo, n_super_admit,
                        "sorted(rank, octant)")
        # rank + origin Morton (4 bits/axis over the mesh bounds):
        # spatially-close origins see similar cluster silhouettes
        lo = jnp.min(aabb_j[:, 0:3], axis=0)
        hi = jnp.max(jnp.where(aabb_j[:, 3:6] < 1e37, aabb_j[:, 3:6],
                               -jnp.inf), axis=0)
        def q4(v, a):
            return jnp.clip(((v - lo[a]) / (hi[a] - lo[a]) * 16), 0, 15
                            ).astype(jnp.int32)
        def spread(b):
            return ((b & 1) | ((b & 2) << 2) | ((b & 4) << 4)
                    | ((b & 8) << 6))
        morton = (spread(q4(o.x, 0)) | (spread(q4(o.y, 1)) << 1)
                  | (spread(q4(o.z, 2)) << 2))
        _, permm = jax.lax.sort_key_val(key * 4096 * 8 + morton * 8
                                        + octant, iota)
        compacted_pairs(aabb_j, o, d, alive, t_seed, permm, n_super_admit,
                        "sorted(rank, morton, octant)")
        _, permn = jax.lax.sort_key_val(morton * 8 + octant, iota)
        # morton+octant needs an admit-first partition on top
        permn = jnp.concatenate([
            jnp.take(permn, jnp.where(jnp.take(admit, permn),
                                      size=n, fill_value=0)[0], axis=0)])
        compacted_pairs(aabb_j, o, d, alive, t_seed, permn, n_super_admit,
                        "sorted(morton, octant)")
        # oracle: sort by first admitted CLUSTER rank (768-way, costs
        # ~2.6 ms to compute in prod but shows the ceiling)
        crank = front_to_back_rank(aabb_j, o, alive)
        ckey = jnp.concatenate([
            cluster_first_key(aabb_j, crank, o.x[sl], o.y[sl], o.z[sl],
                              d.x[sl], d.y[sl], d.z[sl], alive[sl],
                              t_seed[sl])
            for sl in (slice(s, s + CHUNK) for s in range(0, n, CHUNK))])
        _, perm3 = jax.lax.sort_key_val(ckey, iota)
        compacted_pairs(aabb_j, o, d, alive, t_seed, perm3, n_cl_admit,
                        "sorted(first-CLUSTER rank)")
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
