"""Component costs of the compact-then-trace wrapper at 1080p scale.

Times each data-movement strategy for the compaction (index build,
ray gather, result scatter) plus the compacted vs dense kernel on
REAL config-6 bounce-1 ray state, so the wrapper can be built from the
cheapest pieces.  Honest-mode timing: first readback before any timer,
block_until_ready chained per iteration.

Usage: python scripts/bench_compact_parts.py    (on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 1920 * 1080
CAP = 85 * 1536
ITERS = 20


def timeit(label, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # realistic key distribution: ~4% admitting across 48*8 buckets
    key_np = np.where(rng.random(R) < 0.04,
                      rng.integers(0, 384, R), 384).astype(np.int32)
    key = jnp.asarray(key_np)
    lanes = [jnp.asarray(rng.standard_normal(R).astype(np.float32))
             for _ in range(8)]
    iota = jnp.arange(R, dtype=jnp.int32)
    prefix = jnp.asarray(rng.permutation(R)[:CAP].astype(np.int32))
    pack21 = jnp.asarray(rng.integers(0, 2**30, (CAP, 21)).astype(np.int32))
    # force a first readback (axon: block_until_ready lies before it)
    np.asarray(lanes[0][:8])

    if os.environ.get("SRT_PARTS_SKIP_PRIMS") != "1":
        _prims(key, iota, prefix, lanes, pack21)

    # ---- real config-6 bounce states: dense vs compacted kernel ----
    _kernels()


def _prims(key, iota, prefix, lanes, pack21):
    timeit("sort_key_val (key, iota)",
           jax.jit(lambda k, i: jax.lax.sort_key_val(k, i, is_stable=True)),
           key, iota)
    timeit("lax.sort 1key+8lanes",
           jax.jit(lambda k, *ls: jax.lax.sort((k,) + ls, num_keys=1,
                                               is_stable=True)),
           key, *lanes)
    timeit("stack8 rows + row-take(cap) + T",
           jax.jit(lambda p, *ls: jnp.take(jnp.stack(ls, axis=1), p,
                                           axis=0).T),
           prefix, *lanes)
    timeit("8 x 1-D lane takes(cap)",
           jax.jit(lambda p, *ls: [jnp.take(l, p) for l in ls]),
           prefix, *lanes)
    timeit("(8,R) take axis=1 (cap)",
           jax.jit(lambda p, *ls: jnp.take(jnp.stack(ls, axis=0), p,
                                           axis=1)),
           prefix, *lanes)
    miss = jnp.zeros((21,), jnp.int32)

    def scat_rows(p, pk):
        init = jnp.broadcast_to(miss[None], (R, 21))
        return init.at[p].set(pk, unique_indices=True).T

    timeit("(R,21) row scatter + T", jax.jit(scat_rows), prefix, pack21)

    def scat_lanes(p, pk):
        return [jnp.full((R,), 0, jnp.int32).at[p].set(pk[:, j],
                                                       unique_indices=True)
                for j in range(21)]

    timeit("21 x 1-D lane scatters", jax.jit(scat_lanes), prefix, pack21)

    def scat2(p, pk):
        return [jnp.full((R,), 0, jnp.int32).at[p].set(pk[:, j],
                                                       unique_indices=True)
                for j in range(2)]

    timeit("2 x 1-D lane scatters (t, idx only)", jax.jit(scat2),
           prefix, pack21)


def _kernels():
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import CONFIGS
    from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
    from simple_raytracer_tpu.ops.vec import Vec3, where as vwhere
    from simple_raytracer_tpu.ops.intersect import (closest_hit,
                                                    intersect_spheres,
                                                    intersect_planes)
    from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        intersect_triangles_bvh, intersect_triangles_bvh_compact,
        maybe_sub_aabb)

    scene, camera, _ = CONFIGS[6]()
    opt = RenderOptions(width=1920, height=1080, num_samples=1, num_bounces=4)
    r = Renderer(opt, scene=scene)
    ds = r._device_scene
    cl = ds.triangles.clusters
    cam = camera.state(1920 / 1080)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(1920, 1080, 1, jnp.uint32(7), cam.position,
                               rot, cam.aspect_ratio, cam.fov_scale,
                               tile=(8, 64))
    alive = jnp.ones((R,), bool)
    states = []
    for bounce in range(3):
        t_seed = jnp.full((R,), jnp.inf, jnp.float32)
        if ds.spheres.radius.shape[0]:
            t_seed = jnp.minimum(t_seed, intersect_spheres(o, d, ds.spheres)[0])
        if ds.planes.material.shape[0]:
            t_seed = jnp.minimum(t_seed, intersect_planes(o, d, ds.planes)[0])
        states.append((o, d, alive.astype(jnp.float32), t_seed))
        hit = closest_hit(ds, o, d, tri_backend="bvh", alive=alive)
        cont = alive & hit.hit
        mat = gather_materials(ds.materials, hit.material)
        ms = sample_material(hit.position, hit.normal, hit.front, d, mat,
                             seed)
        o = vwhere(cont, ms.origin, o)
        d = vwhere(cont, ms.direction, d)
        seed = jnp.where(cont, ms.seed, seed)
        alive = cont

    sub, sdiv = maybe_sub_aabb(cl)
    kw = dict(with_attrs=True, table_tr=cl.table_tr, sub_aabb=sub,
              sub_div=sdiv)
    dense_fn = jax.jit(lambda o, d, a, t: intersect_triangles_bvh(
        Vec3(o[0], o[1], o[2]), Vec3(d[0], d[1], d[2]), a, t,
        cl.aabb, cl.table_t, **kw))
    comp_fn = jax.jit(lambda o, d, a, t: intersect_triangles_bvh_compact(
        Vec3(o[0], o[1], o[2]), Vec3(d[0], d[1], d[2]), a, t,
        cl.aabb, cl.table_t, cap=CAP, **kw))
    kw_sh = dict(kw)
    kw_sh.pop("with_attrs", None)
    shade_fn = jax.jit(lambda o, d, a, t: intersect_triangles_bvh_compact(
        Vec3(o[0], o[1], o[2]), Vec3(d[0], d[1], d[2]), a, t,
        cl.aabb, cl.table_t, cap=CAP, shaded=True, **kw_sh))
    for b, (o, d, a, t) in enumerate(states):
        oa = jnp.stack([o.x, o.y, o.z])
        da = jnp.stack([d.x, d.y, d.z])
        timeit(f"bounce{b} dense kernel", dense_fn, oa, da, a, t)
        timeit(f"bounce{b} compact wrapper (cap={CAP})", comp_fn,
               oa, da, a, t)
        timeit(f"bounce{b} compact SHADED (cap={CAP})", shade_fn,
               oa, da, a, t)


if __name__ == "__main__":
    main()
