"""Sweep (K, block_r) for the BVH kernel on a large mesh to find the best
operating point for the HBM path.  One-off round-2 perf diagnostic.

Usage: python scripts/sweep_bvh_params.py [subdiv]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.models.scene import Scene
from simple_raytracer_tpu.models.shapes import transform_trs
from simple_raytracer_tpu.models.materials import Material
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import intersect_planes
from simple_raytracer_tpu.ops.pallas.bvh_kernel import intersect_triangles_bvh
from simple_raytracer_tpu.models.camera import Camera
from simple_raytracer_tpu.ops.vec import Vec3


def build(subdiv, k):
    scene = Scene()
    scene.cluster_size = k
    scene.add_plane((0, -1.2, 0), (0, 1, 0), material=0)
    glass = scene.add_material(Material(color=(0.9, 0.95, 1.0),
                                        smoothness=1.0, transmittance=1.0,
                                        refraction_index=1.5), "Glass")
    pos, nrm = icosphere(subdivisions=subdiv)
    span = scene.pool.append(pos, nrm)
    scene.add_model(span, material=glass,
                    transform=transform_trs((0, 0, -2.5)))
    return scene


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    W, H = 1920, 1080
    camera = Camera(position=(0.0, 0.3, 2.5))
    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)

    ks = ([int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
          else [64, 128, 256])
    brs = ([int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
           else [512, 1024, 1536, 2048])
    for k in ks:
        scene = build(subdiv, k)
        ds = scene.build()
        cl = ds.triangles.clusters
        n_tris = int(np.asarray(ds.triangles.active).sum())
        slots = cl.table_t.shape[0]
        o, d, _ = generate_rays(W, H, 1, jnp.uint32(7), cam.position, rot,
                                cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
        n = o.x.shape[0]
        alive = jnp.ones((n,), jnp.float32)
        t_init, _ = intersect_planes(o, d, ds.planes)
        for block_r in brs:
            for placement in ("hbm", "vmem"):
                if placement == "vmem" and slots > 8192:
                    continue
                f = jax.jit(lambda o, d, al, ti, _b=block_r, _p=placement:
                            intersect_triangles_bvh(
                                o, d, al, ti, cl.aabb, cl.table_t,
                                block_r=_b, with_attrs=True,
                                hbm_table=(_p == "hbm")))
                try:
                    r = jax.block_until_ready(f(o, d, alive, t_init))
                except Exception as e:
                    print(f"K={k} block_r={block_r} {placement}: "
                          f"FAIL {type(e).__name__}: {str(e)[:1500]}")
                    continue
                t0 = time.perf_counter()
                iters = 10
                for _ in range(iters):
                    r = f(o, d, alive, t_init)
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / iters
                print(f"tris={n_tris} clusters={cl.aabb.shape[0]} K={k} "
                      f"block_r={block_r} {placement}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
