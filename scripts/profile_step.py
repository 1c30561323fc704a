#!/usr/bin/env python
"""Component-level timing of one render step on the current device.

Times each stage of the bounce loop in isolation (jitted, steady-state) to
find where the step time goes: intersection, BSDF, sky, material gather,
ray-gen, tonemap.
"""
import time

import jax
import jax.numpy as jnp

from simple_raytracer_tpu.models.presets import config2_four_spheres
from simple_raytracer_tpu.ops import rng
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import closest_hit
from simple_raytracer_tpu.ops.sky import sky_color
from simple_raytracer_tpu.ops.vec import Vec3

W, H, S = 1920, 1080, 1
N = W * H * S


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    scene, camera, _ = config2_four_spheres()
    ds = scene.build()
    cam = camera.state(W / H)

    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = jax.jit(lambda: generate_rays(
        W, H, S, jnp.uint32(1), cam.position, rot, cam.aspect_ratio,
        cam.fov_scale))()
    jax.block_until_ready(o)

    print(f"rays: {N/1e6:.2f} M, device: {jax.devices()[0]}")

    timeit("ray_gen", jax.jit(lambda t: generate_rays(
        W, H, S, t, cam.position, rot, cam.aspect_ratio, cam.fov_scale)),
        jnp.uint32(1))

    hit = jax.jit(lambda o, d: closest_hit(ds, o, d))(o, d)
    jax.block_until_ready(hit)
    timeit("closest_hit", jax.jit(lambda o, d: closest_hit(ds, o, d)), o, d)

    timeit("gather_materials",
           jax.jit(lambda i: gather_materials(ds.materials, i)), hit.material)

    mat = gather_materials(ds.materials, hit.material)
    timeit("sample_material",
           jax.jit(lambda seed: sample_material(
               hit.position, hit.normal, hit.front, d, mat, seed)), seed)

    timeit("sky_color", jax.jit(lambda d: sky_color(d, ds.sky, ds.skybox)), d)

    timeit("rng_direction", jax.jit(lambda s: rng.next_direction(s)), seed)

    # a full fused bounce for comparison
    def bounce(o, d, seed):
        h = closest_hit(ds, o, d)
        m = gather_materials(ds.materials, h.material)
        ms = sample_material(h.position, h.normal, h.front, d, m, seed)
        sk = sky_color(d, ds.sky, ds.skybox)
        return ms.origin, ms.direction, ms.seed, sk

    timeit("full_bounce(fused)", jax.jit(bounce), o, d, seed)


if __name__ == "__main__":
    main()
