"""Decompose a config's step time on TPU: kernels vs dense stages.

Usage: python scripts/profile_config5.py [config_n]

Timing via tpu_time.time_fn (device-chained slope method).
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_time import time_fn

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops import intersect as I
from simple_raytracer_tpu.ops.trace import render_pass
from simple_raytracer_tpu.ops.vec import Vec3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, camera, _ = CONFIGS[n]()
    W, H = 1920, 1080
    ds = scene.build()
    cl = ds.triangles.clusters
    print(f"config{n}: tris={ds.triangles.material.shape[0]} "
          f"clusters={None if cl is None else cl.aabb.shape[0]}")

    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(W, H, 1, jnp.uint32(1), cam.position, rot,
                               cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
    alive = jnp.ones((o.x.shape[0],), jnp.float32)
    tk = lambda f, *a: time_fn(f, *a, n_hi=12, n_lo=2, reps=1)

    for nb in (1, 2, 4):
        fn = functools.partial(render_pass, width=W, height=H,
                               num_samples=1, num_bounces=nb,
                               ray_tile=(8, 64))
        c0 = jnp.zeros((H, W, 3), jnp.float32)

        def f_step(i, c0, _fn=fn):
            return _fn(ds, cam, c0, jnp.uint32(1) + i.astype(jnp.uint32))

        t = tk(f_step, c0)
        print(f"full step nb={nb}: {t*1e3:8.3f} ms "
              f"({W*H*nb/t/1e6:.0f} Mrays/s)", flush=True)

    if cl is not None:
        from simple_raytracer_tpu.ops.pallas.bvh_kernel import \
            intersect_triangles_bvh
        t_init, _ = jax.jit(lambda: I.intersect_planes(o, d, ds.planes))()

        def f_bvh(i, ox):
            ti = t_init * (1.0 + 1e-9 * i.astype(jnp.float32))
            t, idx, attrs = intersect_triangles_bvh(
                o, d, alive, ti, cl.aabb, cl.table_t, with_attrs=True)
            return jnp.where(jnp.isfinite(t), t, 0.0)

        t = tk(f_bvh, o.x)
        print(f"split BVH kernel (primaries): {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
