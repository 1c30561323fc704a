"""Decompose config 7's compacted secondary-bounce cost (the 123 ms
between step[1] and step[2] in SRT_PROFILE_CONFIG=7 profile_config6.py).

Pieces, all on the REAL bounce-1 ray distribution (trace one bounce of
the 1080p camera grid, keep the BSDF continuation rays):

  wrapper[key]    full intersect_triangles_bvh_compact (shaded), per key
  kernel[key]     inner intersect_triangles_bvh alone on the cap-sized
                  compacted prefix that key produces
  xla-side        admission + sort + gather + scatter with the kernel
                  replaced by a passthrough (the wrapper's XLA overhead)
  visits/block    prepass visit counts over the compacted prefix — the
                  serial DMA pipeline length the keys are trying to cut

Usage: python scripts/profile_compact7.py [iters]   (on the TPU)
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
W, H = 1920, 1080


def chain_time(f, *args, iters=ITERS):
    # warm + flip the axon tunnel into honest mode with a REAL d2h
    # readback (block_until_ready alone can return without waiting —
    # scripts/bench_gather.py documents the trap; observed again
    # 2026-08-21: a 120 ms kernel "timed" 0.83 ms in a process that had
    # already done scalar readbacks, so the final wait below is also a
    # full readback — the device executes dispatches in-order, so
    # reading the last result back bounds every iteration)
    r = jax.block_until_ready(f(*args))
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / iters


def bounce1_rays(ds, camera):
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

    return jax.block_until_ready(one_bounce(o, d, seed))


def compact_prefix(o, d, alive, t_init, cl, cap, key):
    """The wrapper's admission+sort front half (bk._compact_prefix):
    the cap-sized compacted ray set the inner kernel would see."""
    pick = jax.jit(lambda o, d, al, ti: bk._compact_prefix(
        o, d, al, ti, cl.aabb, cap, key))
    prefix, count = pick(o, d, alive, t_init)
    return np.asarray(prefix), int(count)


def visit_stats(label, cl, o, d, alive, t_init, block_r=1536):
    pre = jax.jit(lambda *a: bk._visit_prepass(
        *a, cl.aabb, block_r, (-o.x.shape[0]) % block_r)[1])
    c = np.asarray(pre(o, d, alive, t_init))
    print(f"  {label}: visits/block mean {c.mean():.1f} "
          f"p90 {np.percentile(c, 90):.0f} max {c.max()} "
          f"sum {c.sum()} dead {(c == 0).mean() * 100:.0f}%", flush=True)


def main():
    scene, camera, _ = CONFIGS[7]()
    ds = scene.build()
    cl = ds.triangles.clusters
    o, d, alive, t_seed = bounce1_rays(ds, camera)
    n_rays = o.x.shape[0]
    cap = bk.compact_cap_auto(n_rays)
    live = float(np.asarray(alive).mean())
    print(f"rays {n_rays:,} live {live * 100:.0f}% cap {cap:,}",
          flush=True)

    take = lambda v, idx: jnp.asarray(np.asarray(v)[idx])

    keys = (os.environ.get("SRT_PC7_KEYS") or "super,morton").split(",")
    for key in keys:
        os.environ["SRT_BVH_COMPACT_KEY"] = key
        wrapper = jax.jit(lambda o, d, al, ti: bk.__dict__[
            "intersect_triangles_bvh_compact"](
            o, d, al, ti, cl.aabb, cl.table_t, cap=cap, shaded=True,
            table_tr=cl.table_tr, sort_key=key))
        dt = chain_time(wrapper, o, d, alive, t_seed)
        print(f"wrapper[{key}]  {dt * 1e3:8.2f} ms", flush=True)
        del os.environ["SRT_BVH_COMPACT_KEY"]

    # inner kernel alone on each key's actual compacted prefix
    for key in keys:
        prefix, count = compact_prefix(o, d, alive, t_seed, cl, cap, key)
        oc = Vec3(take(o.x, prefix), take(o.y, prefix), take(o.z, prefix))
        dc = Vec3(take(d.x, prefix), take(d.y, prefix), take(d.z, prefix))
        ac = take(alive, prefix)
        tc = take(t_seed, prefix)
        print(f"[{key}] admitted {count:,}", flush=True)
        visit_stats(f"[{key}] compacted prefix", cl, oc, dc, ac, tc)
        kern = jax.jit(lambda o, d, al, ti: bk.intersect_triangles_bvh(
            o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
            table_tr=cl.table_tr))
        dt = chain_time(kern, oc, dc, ac, tc)
        print(f"kernel[{key}]  {dt * 1e3:8.2f} ms", flush=True)
        if key == "super":
            for br in (512, 768, 3072):
                visit_stats(f"[super] block_r={br}", cl, oc, dc, ac, tc,
                            block_r=br)
                kern = jax.jit(
                    lambda o, d, al, ti, br=br: bk.intersect_triangles_bvh(
                        o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
                        table_tr=cl.table_tr, block_r=br))
                dt = chain_time(kern, oc, dc, ac, tc)
                print(f"kernel[super,br={br}]  {dt * 1e3:8.2f} ms",
                      flush=True)
            if os.environ.get("SRT_PC7_ABLATE", "1") != "0":
                ablation_matrix(cl, oc, dc, ac, tc)


def ablation_matrix(cl, oc, dc, ac, tc):
    """Split the per-visit cost on the super-key compacted prefix:
      M  (Moller-Trumbore)   = full - no_mt
      T  (tile transpose)    = no_mt - no_mt+no_tr
      W  (re-slab word)      = no_mt+no_tr - no_mt+no_tr+subword
      D  (DMA wait)          = ...+subword[slots=8] vs [slots=2]
      S  (list+loop skeleton)= nowork+nodma (W still computed at issue)
    no_mt/no_tr monkeypatch module helpers; subword/nowork/nodma are
    trace-time SRT_BVH_ABLATE flags in _kernel_hbm."""
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bkm
    raw_fn = bkm.intersect_triangles_bvh.__wrapped__

    def run(label, env_ablate="", slots=None, no_mt=False, no_tr=False):
        orig_mt = bkm._mt_update_sub
        orig_tr = bkm._tile_transpose
        if no_mt:
            bkm._mt_update_sub = (lambda tile, rays, t_scr, idx_scr,
                                  attr_scr, t_sub, s, wa: None)
        if no_tr:
            bkm._tile_transpose = lambda tile: jnp.zeros(
                (tile.shape[1], tile.shape[0]), jnp.float32)
        if env_ablate:
            os.environ["SRT_BVH_ABLATE"] = env_ablate
        if slots is not None:
            os.environ["SRT_BVH_DMA_SLOTS"] = str(slots)
        try:
            f = jax.jit(lambda o, d, al, ti: raw_fn(
                o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
                table_tr=cl.table_tr))
            dt = chain_time(f, oc, dc, ac, tc)
            print(f"  ablate {label:34s} {dt * 1e3:8.2f} ms", flush=True)
        finally:
            bkm._mt_update_sub = orig_mt
            bkm._tile_transpose = orig_tr
            os.environ.pop("SRT_BVH_ABLATE", None)
            os.environ.pop("SRT_BVH_DMA_SLOTS", None)

    run("full slots=8")
    run("full slots=2", slots=2)
    # all-ones words, MT still on: what the word GATING saves in MT —
    # if this is close to full, the 28 ms re-slab can move to list-build
    # time (or go entirely) without inflating MT
    run("subword only (MT ungated)", "subword")
    run("no_mt", no_mt=True)
    run("no_mt+no_tr", no_mt=True, no_tr=True)
    run("no_mt+no_tr+subword", "subword", no_mt=True, no_tr=True)
    run("no_mt+no_tr+subword slots=2", "subword", slots=2,
        no_mt=True, no_tr=True)
    run("nowork", "nowork")
    run("nowork+nodma", "nowork,nodma")


if __name__ == "__main__":
    main()
