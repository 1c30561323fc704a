"""Decompose config 6's step time (82K-tri HBM BVH path) on the device.

Pieces timed (all device-chained, steady state):
  step[b]        full render step at b bounces   -> per-bounce marginal cost
  bvh_primary    intersect_triangles_bvh (HBM) on the primary ray batch
  bvh_incoh      same, directions shuffled across rays (secondary-bounce
                 coherence worst case; origins on a shell around the mesh)
  prepass        the XLA supercluster visit prepass alone (same shapes)

Usage: python scripts/profile_config6.py [iters]
  SRT_PROFILE_CONFIG=7 decomposes config 7 (1.31M-tri mega-mesh) with
  the same pieces — the presets share the HBM streaming path.
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
from simple_raytracer_tpu.ops.intersect import intersect_planes
from simple_raytracer_tpu.ops.pallas import bvh_kernel as bk
from simple_raytracer_tpu.ops.vec import Vec3

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
W, H = 1920, 1080


def chain_time(f, *args, iters=ITERS):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    scene, camera, _ = CONFIGS[int(os.environ.get("SRT_PROFILE_CONFIG",
                                                  "6"))]()
    ds = scene.build()
    cl = ds.triangles.clusters
    n_tris = int(np.asarray(ds.triangles.active).sum())
    print(f"tris={n_tris} clusters={cl.aabb.shape[0]} "
          f"table_slots={cl.table_t.shape[0]} "
          f"table={cl.table_t.nbytes / 1e6:.1f} MB", flush=True)

    for b in (1, 2, 4):
        opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=b)
        r = Renderer(opts, scene=scene)
        st = r.benchmark_step(camera, iters=ITERS, warmup=2)
        print(f"step[{b} bounce] {st['seconds_per_step'] * 1e3:8.2f} ms  "
              f"{st['mrays_per_second']:7.1f} Mrays/s", flush=True)

    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(W, H, 1, jnp.uint32(7), cam.position, rot,
                               cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
    n = o.x.shape[0]
    alive = jnp.ones((n,), jnp.float32)
    t_init, _ = intersect_planes(o, d, ds.planes)

    # aabb/table must travel as ARGUMENTS: closure-capturing them bakes
    # the (possibly multi-100MB) table into the HLO as a constant, which
    # the axon remote-compile endpoint rejects (HTTP 413) at config-7 size
    f_bvh = jax.jit(lambda o, d, al, ti, aabb, tab: bk.intersect_triangles_bvh(
        o, d, al, ti, aabb, tab, with_attrs=True, hbm_table=True))
    dt = chain_time(f_bvh, o, d, alive, t_init, cl.aabb, cl.table_t)
    print(f"bvh_primary    {dt * 1e3:8.2f} ms", flush=True)

    # incoherent worst case: shuffle directions across rays so neighboring
    # lanes point nowhere near each other (what bounce 2+ looks like)
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    d_sh = Vec3(d.x[perm], d.y[perm], d.z[perm])
    dt = chain_time(f_bvh, o, d_sh, alive, jnp.full((n,), jnp.inf),
                    cl.aabb, cl.table_t)
    print(f"bvh_incoh      {dt * 1e3:8.2f} ms", flush=True)

    # prepass alone (supercluster boxes built exactly like the caller does)
    c = cl.aabb.shape[0]
    c_pad = ((c + bk._SUPER - 1) // bk._SUPER) * bk._SUPER
    sent = jnp.full((c_pad - c, 8), 3.0e38, jnp.float32).at[:, 6:].set(0.0)
    aabb_p = jnp.concatenate([cl.aabb, sent]) if c_pad > c else cl.aabb
    grp = aabb_p.reshape(c_pad // bk._SUPER, bk._SUPER, 8)
    super_aabb = jnp.concatenate(
        [grp[:, :, :3].min(axis=1), grp[:, :, 3:6].max(axis=1),
         jnp.zeros((c_pad // bk._SUPER, 2), jnp.float32)], axis=1)
    block_r = 1536
    pad_r = (-n) % block_r
    f_pre = jax.jit(lambda o, d, al, ti: bk._visit_prepass(
        o, d, al, ti, super_aabb, block_r, pad_r))
    dt = chain_time(f_pre, o, d, alive, t_init)
    print(f"prepass        {dt * 1e3:8.2f} ms  "
          f"(supers={super_aabb.shape[0]})", flush=True)
    dt = chain_time(f_pre, o, d_sh, alive, jnp.full((n,), jnp.inf))
    print(f"prepass_incoh  {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
