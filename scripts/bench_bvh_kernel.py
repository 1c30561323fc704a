"""Standalone correctness + throughput check of the BVH kernel (VMEM and
HBM table placements) vs the dense jnp path, on config-4-like data.

Usage: python scripts/bench_bvh_kernel.py [block_r] [K] [floor]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simple_raytracer_tpu.models.presets import config4_mesh_glass
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import (intersect_planes,
                                                intersect_triangles)
from simple_raytracer_tpu.ops.pallas.bvh_kernel import intersect_triangles_bvh


def build_scene(k):
    from simple_raytracer_tpu.models.scene import Scene
    scene, camera, _ = config4_mesh_glass()
    scene.cluster_size = k
    ds = scene.build()
    cl = ds.triangles.clusters
    return scene, camera, ds, cl


def main():
    block_r = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    scene, camera, ds, cl = build_scene(k)
    width, height = 1920, 1080
    n_tris = int(np.asarray(ds.triangles.active).sum())
    print(f"tris={n_tris} clusters={cl.aabb.shape[0]} K={k} "
          f"block_r={block_r} table={cl.table_t.nbytes/1e6:.2f} MB")

    cam = camera.state(width / height)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(width, height, 1, jnp.uint32(7), cam.position,
                               rot, cam.aspect_ratio, cam.fov_scale,
                               tile=(8, 64))
    n = o.x.shape[0]
    alive = jnp.ones((n,), jnp.float32)
    t_init, _ = intersect_planes(o, d, ds.planes)

    f_dense = jax.jit(lambda o, d: intersect_triangles(o, d, ds.triangles))
    f_vmem = jax.jit(lambda o, d, al, ti: intersect_triangles_bvh(
        o, d, al, ti, cl.aabb, cl.table_t, block_r=block_r,
        hbm_table=False))
    f_hbm = jax.jit(lambda o, d, al, ti: intersect_triangles_bvh(
        o, d, al, ti, cl.aabb, cl.table_t, block_r=block_r,
        hbm_table=True))

    t_d, i_d = jax.block_until_ready(f_dense(o, d))
    t_d_np = np.asarray(t_d)
    wins = t_d_np < np.asarray(t_init)
    for name, f in (("vmem", f_vmem), ("hbm", f_hbm)):
        t_k, i_k = jax.block_until_ready(f(o, d, alive, t_init))
        t_k, i_k = np.asarray(t_k), np.asarray(i_k)
        assert np.array_equal(wins, i_k >= 0), f"{name}: win mask mismatch"
        np.testing.assert_array_equal(t_k[wins], t_d_np[wins])
        np.testing.assert_array_equal(i_k[wins], np.asarray(i_d)[wins])
    print(f"correct: {wins.sum()} triangle wins of {n} rays (both variants)")

    for name, f, args in [("dense", f_dense, (o, d)),
                          ("vmem", f_vmem, (o, d, alive, t_init)),
                          ("hbm", f_hbm, (o, d, alive, t_init))]:
        r = jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:6s} {dt*1e3:8.3f} ms  "
              f"{n * n_tris / dt / 1e9:8.1f} Gtest/s-equiv")


if __name__ == "__main__":
    main()
