"""Sweep (K, block_r, placement) for the BVH kernel on a large mesh.

Usage: python scripts/sweep_bvh_params.py [subdiv] [k1,k2,...] [br1,...]

Timing via tpu_time.time_fn (device-chained slope method) — plain
block_until_ready loops are unreliable on the remote-attached device.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_time import time_fn

from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.models.scene import Scene
from simple_raytracer_tpu.models.shapes import transform_trs
from simple_raytracer_tpu.models.materials import Material
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import intersect_planes
from simple_raytracer_tpu.ops.pallas.bvh_kernel import intersect_triangles_bvh
from simple_raytracer_tpu.models.camera import Camera


def build(subdiv, k):
    scene = Scene()
    scene.cluster_size = k
    scene.cluster_threshold = 64
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
    ks = ([int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
          else [64, 128])
    brs = ([int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
           else [1536])
    W, H = 1920, 1080
    camera = Camera(position=(0.0, 0.3, 2.5))
    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, _ = generate_rays(W, H, 1, jnp.uint32(7), cam.position, rot,
                            cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
    alive = jnp.ones((o.x.shape[0],), jnp.float32)
    for k in ks:
        ds = build(subdiv, k).build()
        cl = ds.triangles.clusters
        n_tris = int(np.asarray(ds.triangles.active).sum())
        t_init, _ = jax.jit(lambda: intersect_planes(o, d, ds.planes))()
        for block_r in brs:
            for placement in ("hbm", "vmem"):
                if placement == "vmem" and cl.table_t.shape[0] > 8192:
                    continue

                def fn(i, o_x, _p=placement, _b=block_r):
                    ti = t_init * (1.0 + 1e-9 * i.astype(jnp.float32))
                    t, idx, attrs = intersect_triangles_bvh(
                        o, d, alive, ti, cl.aabb, cl.table_t, block_r=_b,
                        with_attrs=True, hbm_table=(_p == "hbm"))
                    return jnp.where(jnp.isfinite(t), t, 0.0)

                try:
                    dt = time_fn(fn, o.x, n_hi=12, n_lo=2, reps=1)
                    print(f"tris={n_tris} clusters={cl.aabb.shape[0]} "
                          f"K={k} block_r={block_r} {placement}: "
                          f"{dt*1e3:8.3f} ms", flush=True)
                except Exception as e:
                    print(f"K={k} block_r={block_r} {placement}: "
                          f"FAIL {type(e).__name__}: {str(e)[:300]}",
                          flush=True)


if __name__ == "__main__":
    main()
