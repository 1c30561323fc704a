"""Time the BVH kernel on REAL secondary-bounce ray distributions.

profile_config6.py showed bounce 2 adds ~86 ms to config 6's step while
bounce 1 costs ~16 ms; this script extracts the actual bounce-2 rays
(trace one bounce of the scan path, take the sampled continuation rays
and their alive mask / plane-seeded t_init) and chain-times
intersect_triangles_bvh variants on that exact distribution, so kernel
experiments (block size, hierarchy levels, table residence) measure the
workload that matters instead of the synthetic full-shuffle worst case.

Also prints visit statistics (mean/max clusters visited per ray block at
child level) computed with the same slab math as the prepass — the
serial in-kernel iteration count the variants are trying to cut.

Usage: python scripts/profile_bounce2.py [iters]   (run on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import closest_hit, intersect_planes
from simple_raytracer_tpu.ops.pallas import bvh_kernel as bk
from simple_raytracer_tpu.ops.vec import Vec3

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
W, H = 1920, 1080


def chain_time(f, *args, iters=ITERS):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bounce2_rays(ds, camera):
    """One scan-path bounce: returns the continuation rays exactly as
    trace_rays would feed bounce 2 (origin/direction/alive), plus the
    sphere/plane best-t seed for the BVH far bound."""
    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(W, H, 1, jnp.uint32(7), cam.position, rot,
                               cam.aspect_ratio, cam.fov_scale, tile=(8, 64))

    @jax.jit
    def one_bounce(o, d, seed):
        hit = closest_hit(ds, o, d, tri_backend="bvh",
                          alive=jnp.ones_like(o.x, bool))
        mat = gather_materials(ds.materials, hit.material)
        ms = sample_material(hit.position, hit.normal, hit.front, d, mat,
                             seed)
        alive = hit.hit.astype(jnp.float32)
        t_seed, _ = intersect_planes(ms.origin, ms.direction, ds.planes)
        return ms.origin, ms.direction, alive, t_seed

    o2, d2, alive, t_seed = jax.block_until_ready(one_bounce(o, d, seed))
    return o2, d2, alive, t_seed


def visit_stats(ds, o, d, alive, t_init, block_r):
    cl = ds.triangles.clusters
    n = o.x.shape[0]
    # jitted + ray-chunked: the eager (C, R) slab temps are ~6 GB at 768
    # clusters x 2M rays and exhaust HBM
    pre = jax.jit(lambda *a: bk._visit_prepass(*a, cl.aabb, block_r, 0)[1])
    chunk = 128 * block_r
    parts = []
    for s in range(0, n - n % chunk, chunk):
        sl = slice(s, s + chunk)
        parts.append(np.asarray(pre(
            Vec3(o.x[sl], o.y[sl], o.z[sl]),
            Vec3(d.x[sl], d.y[sl], d.z[sl]), alive[sl], t_init[sl])))
    c = np.concatenate(parts)
    print(f"  child-level visits/block (block_r={block_r}): "
          f"mean {c.mean():.1f}  p90 {np.percentile(c, 90):.0f}  "
          f"max {c.max()}  dead-blocks {(c == 0).mean() * 100:.0f}%",
          flush=True)


def main():
    scene, camera, _ = CONFIGS[6]()
    ds = scene.build()
    cl = ds.triangles.clusters
    o2, d2, alive, t_seed = bounce2_rays(ds, camera)
    live = float(np.asarray(alive).mean())
    print(f"bounce-2 rays: {o2.x.shape[0]}  live {live * 100:.0f}%",
          flush=True)
    visit_stats(ds, o2, d2, alive, t_seed, 1536)
    visit_stats(ds, o2, d2, alive, t_seed, 512)

    def run(label, **kw):
        f = jax.jit(lambda o, d, al, ti: bk.intersect_triangles_bvh(
            o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
            table_tr=cl.table_tr, **kw))
        dt = chain_time(f, o2, d2, alive, t_seed)
        print(f"{label:28s} {dt * 1e3:8.2f} ms", flush=True)

    run("packed-vmem group br=1536", packed_vmem=True)

    # --- per-visit cost split: compile ablated kernel variants ---------
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bkm

    def ablate(label, no_mt=False, no_transpose=False):
        orig_mt = bkm._mt_update_sub
        orig_tr = bkm._tile_transpose
        if no_mt:
            bkm._mt_update_sub = (
                lambda tile, rays, t_scr, idx_scr, attr_scr, t_sub, s,
                wa: None)
        if no_transpose:
            bkm._tile_transpose = lambda tile: jnp.zeros(
                (tile.shape[1], tile.shape[0]), jnp.float32)
        try:
            # the public entry is itself jitted (the ablated helpers
            # would be ignored on a cache hit) — trace the raw function
            raw = bkm.intersect_triangles_bvh.__wrapped__
            f = jax.jit(lambda o, d, al, ti: raw(
                o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
                table_tr=cl.table_tr, packed_vmem=True))
            dt = chain_time(f, o2, d2, alive, t_seed)
            print(f"{label:28s} {dt * 1e3:8.2f} ms", flush=True)
        finally:
            bkm._mt_update_sub = orig_mt
            bkm._tile_transpose = orig_tr

    ablate("  ablated: no MT", no_mt=True)
    ablate("  ablated: no MT+transpose", no_mt=True, no_transpose=True)

    # --- what a global direction sort would buy (analysis only) -------
    dn = np.stack([np.asarray(d2.x), np.asarray(d2.y), np.asarray(d2.z)])
    on = np.stack([np.asarray(o2.x), np.asarray(o2.y), np.asarray(o2.z)])
    octant = ((dn[0] >= 0).astype(np.int64) * 4
              + (dn[1] >= 0) * 2 + (dn[2] >= 0))
    cell = np.zeros_like(octant)
    for ax in range(3):
        q = np.clip(((on[ax] - on[ax].min())
                     / max(float(np.ptp(on[ax])), 1e-6) * 8
                     ).astype(np.int64), 0, 7)
        cell = cell * 8 + q
    dead_last = (np.asarray(alive) <= 0).astype(np.int64)
    perm = np.argsort(dead_last * (1 << 40) + octant * (1 << 30) + cell,
                      kind="stable")
    tk = lambda v: jnp.asarray(np.asarray(v)[perm])
    o_s = Vec3(tk(o2.x), tk(o2.y), tk(o2.z))
    d_s = Vec3(tk(d2.x), tk(d2.y), tk(d2.z))
    print("after (alive, octant, origin-cell) sort:", flush=True)
    visit_stats(ds, o_s, d_s, tk(alive), tk(t_seed), 1536)

    f = jax.jit(lambda o, d, al, ti: bk.intersect_triangles_bvh(
        o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
        table_tr=cl.table_tr, packed_vmem=True))
    dt = chain_time(f, o_s, d_s, tk(alive), tk(t_seed))
    print(f"{'packed-vmem SORTED rays':28s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
