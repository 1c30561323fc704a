"""Decompose config5's step time on TPU: prepass vs kernel vs dense
primitives vs BSDF/sky/rest.  One-off diagnostic for round-2 perf work.

Usage: python scripts/profile_config5.py [config_n]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops import intersect as I
from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
    intersect_triangles_bvh, _visit_prepass)
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.sky import sky_color
from simple_raytracer_tpu.engine import Renderer, RenderOptions


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, camera, _ = CONFIGS[n]()
    W, H, S, B = 1920, 1080, 1, 4
    ds = scene.build()
    cl = ds.triangles.clusters
    print(f"config{n}: tris={ds.triangles.material.shape[0]} "
          f"clusters={None if cl is None else cl.aabb.shape[0]}")

    rot = camera_rotation(jnp.float32(camera.yaw), jnp.float32(camera.pitch))
    from simple_raytracer_tpu.ops.vec import Vec3
    o, d, seed = generate_rays(W, H, S, jnp.int32(1),
                               Vec3(*map(jnp.float32, camera.position)), rot,
                               jnp.float32(W / H), jnp.float32(1.0))
    R = o.x.shape[0]
    alive = jnp.ones((R,), jnp.float32)
    t_init = jnp.full((R,), jnp.inf, jnp.float32)

    # full step baseline
    r = Renderer(RenderOptions(width=W, height=H, num_samples=S,
                               num_bounces=B), scene=scene)
    stats = r.benchmark_step(camera, iters=10, warmup=3)
    print(f"full step: {stats['seconds_per_step']*1e3:.2f} ms "
          f"({stats['mrays_per_second']:.1f} Mrays/s)")

    # dense sphere+plane
    if ds.spheres.radius.shape[0]:
        t = timeit(jax.jit(lambda: I.intersect_spheres(o, d, ds.spheres)))
        print(f"spheres dense: {t*1e3:.2f} ms")
    t = timeit(jax.jit(lambda: I.intersect_planes(o, d, ds.planes)))
    print(f"planes dense:  {t*1e3:.2f} ms")

    if cl is not None:
        block_r = 1536
        pad_r = (-R) % block_r
        t = timeit(jax.jit(lambda: _visit_prepass(
            o, d, alive, t_init, jnp.asarray(cl.aabb), block_r, pad_r)))
        print(f"visit prepass: {t*1e3:.2f} ms")

        t = timeit(jax.jit(lambda: intersect_triangles_bvh(
            o, d, alive, t_init, jnp.asarray(cl.aabb),
            jnp.asarray(cl.table_t), with_attrs=True)))
        print(f"bvh kernel (incl prepass, attrs): {t*1e3:.2f} ms")

        t = timeit(jax.jit(lambda: intersect_triangles_bvh(
            o, d, alive, t_init, jnp.asarray(cl.aabb),
            jnp.asarray(cl.table_t), with_attrs=False)))
        print(f"bvh kernel (incl prepass, no attrs): {t*1e3:.2f} ms")

    # full closest_hit
    t = timeit(jax.jit(lambda: I.closest_hit(ds, o, d)))
    print(f"closest_hit:   {t*1e3:.2f} ms")

    # BSDF + materials
    hit = jax.jit(lambda: I.closest_hit(ds, o, d))()
    mat = jax.jit(lambda: gather_materials(ds.materials, hit.material))()
    t = timeit(jax.jit(lambda: gather_materials(ds.materials, hit.material)))
    print(f"gather_materials: {t*1e3:.2f} ms")
    t = timeit(jax.jit(lambda: sample_material(
        hit.position, hit.normal, hit.front, d, mat, seed)))
    print(f"sample_material:  {t*1e3:.2f} ms")
    t = timeit(jax.jit(lambda: sky_color(d, ds.sky, ds.skybox)))
    print(f"sky_color:        {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
