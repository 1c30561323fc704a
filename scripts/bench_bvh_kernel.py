"""Standalone correctness + throughput check of the new bvh_kernel vs the
dense jnp path and the round-1 clustered kernel, on config-4-like data.

Usage: python scripts/bench_bvh_kernel.py [block_r] [K]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simple_raytracer_tpu import accel
from simple_raytracer_tpu.models.presets import config4_mesh_glass
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import (intersect_planes,
                                                intersect_triangles)
from simple_raytracer_tpu.ops.pallas.bvh_kernel import intersect_triangles_bvh
from simple_raytracer_tpu.ops.pallas.cluster_kernel import (
    intersect_triangles_clustered)


def build_tables(scene, k):
    """Rebuild the cluster table at cluster size k (same as Scene.build)."""
    pos_list, nrm_list = [], []
    for m in scene.models:
        wpos, wnrm = m.world_triangles(scene.pool)
        pos_list.append(wpos)
        nrm_list.append(wnrm)
    pos = np.concatenate(pos_list)
    cl = accel.build_clusters(pos, k=k)
    pos = pos[cl.order]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    slot = cl.slots
    valid = slot >= 0
    si = np.clip(slot, 0, pos.shape[0] - 1)
    c, kk = slot.shape
    table = np.zeros((16, c * kk), np.float32)
    table[0:3] = pos[si, 0].reshape(c * kk, 3).T
    table[3:6] = e1[si].reshape(c * kk, 3).T
    table[6:9] = e2[si].reshape(c * kk, 3).T
    table[9] = valid.reshape(-1).astype(np.float32)
    table[10] = si.reshape(-1).astype(np.float32)
    table_t = np.ascontiguousarray(table[:16].T)      # (C*K, 16)
    return jnp.asarray(cl.aabb), jnp.asarray(table), jnp.asarray(table_t), pos


def main():
    block_r = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    scene, camera, _ = config4_mesh_glass()
    width, height = 1920, 1080
    aabb, table, table_t, pos = build_tables(scene, k)
    n_tris = pos.shape[0]
    print(f"tris={n_tris} clusters={aabb.shape[0]} K={k} block_r={block_r} "
          f"table={table.nbytes/1e6:.2f} MB")

    cam = camera.state(width / height)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(width, height, 1, jnp.uint32(7), cam.position,
                               rot, cam.aspect_ratio, cam.fov_scale,
                               tile=(8, 64))
    n = o.x.shape[0]
    alive = jnp.ones((n,), jnp.float32)

    # plane hit seeds t_init (the scene's ground plane)
    dev = scene.build()
    t_p, _ = intersect_planes(o, d, dev.planes)
    t_init = t_p

    # dense reference on the SAME reordered triangles
    from simple_raytracer_tpu.ops.scene_types import TrianglesSoA
    from simple_raytracer_tpu.ops.vec import Vec3
    pad = (-n_tris) % 256
    pp = np.concatenate([pos, np.zeros((pad, 3, 3), np.float32)])
    tr = TrianglesSoA(
        v0=Vec3(*(jnp.asarray(pp[:, 0, i]) for i in range(3))),
        v1=Vec3(*(jnp.asarray(pp[:, 1, i]) for i in range(3))),
        v2=Vec3(*(jnp.asarray(pp[:, 2, i]) for i in range(3))),
        n0=None, n1=None, n2=None, material=None,
        active=jnp.asarray(np.arange(n_tris + pad) < n_tris),
        shade=None, clusters=None)

    f_dense = jax.jit(lambda o, d: intersect_triangles(o, d, tr))
    f_bvh = jax.jit(lambda o, d, al, ti: intersect_triangles_bvh(
        o, d, al, ti, aabb, table_t, block_r=block_r))
    f_clu = jax.jit(lambda o, d, al: intersect_triangles_clustered(
        o, d, al, aabb, table, block_r=512))

    t_d, i_d = jax.block_until_ready(f_dense(o, d))
    t_b, i_b = jax.block_until_ready(f_bvh(o, d, alive, t_init))
    t_c, i_c = jax.block_until_ready(f_clu(o, d, alive))

    # correctness: where bvh reports a win it must match dense (and beat
    # t_init); where dense has a hit closer than t_init, bvh must report it
    t_d_np, i_d_np = np.asarray(t_d), np.asarray(i_d)
    t_b_np, i_b_np = np.asarray(t_b), np.asarray(i_b)
    dense_wins = t_d_np < np.asarray(t_init)
    assert np.array_equal(dense_wins, i_b_np >= 0), "win mask mismatch"
    np.testing.assert_array_equal(t_b_np[dense_wins], t_d_np[dense_wins])
    np.testing.assert_array_equal(i_b_np[dense_wins], i_d_np[dense_wins])
    print(f"correct: {dense_wins.sum()} triangle wins of {n} rays")

    for name, f, args in [("dense", f_dense, (o, d)),
                          ("clustered", f_clu, (o, d, alive)),
                          ("bvh", f_bvh, (o, d, alive, t_init))]:
        r = jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:10s} {dt*1e3:8.3f} ms  "
              f"{n * n_tris / dt / 1e9:8.1f} Gtest/s-equiv")


if __name__ == "__main__":
    main()


def floor_probe(block_r=1536, k=128):
    """Measure the zero-visit kernel floor and the prepass cost alone."""
    scene, camera, _ = config4_mesh_glass()
    aabb, table, table_t, pos = build_tables(scene, k)
    n = 1920 * 1080
    import numpy as np
    rng = np.random.default_rng(0)
    o = [jnp.asarray(np.full(n, 50.0, np.float32)) for _ in range(3)]
    d = [jnp.asarray(rng.normal(size=n).astype(np.float32)) for _ in range(3)]
    from simple_raytracer_tpu.ops.vec import Vec3, normalize
    ov = Vec3(*o)
    dv = normalize(Vec3(*d))
    alive = jnp.ones((n,), jnp.float32)
    t_init = jnp.full((n,), jnp.inf, jnp.float32)

    f_bvh = jax.jit(lambda o, d, al, ti: intersect_triangles_bvh(
        o, d, al, ti, aabb, table_t, block_r=block_r))
    r = jax.block_until_ready(f_bvh(ov, dv, alive, t_init))
    t0 = time.perf_counter()
    for _ in range(30):
        r = f_bvh(ov, dv, alive, t_init)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 30
    nb = -(-n // block_r)
    print(f"floor block_r={block_r}: {dt*1e3:.3f} ms "
          f"({dt/nb*1e6:.2f} us/block, {nb} blocks)")

    # all-dead rays (alive=0): same path, visits all zero
    alive0 = jnp.zeros((n,), jnp.float32)
    r = jax.block_until_ready(f_bvh(ov, dv, alive0, t_init))
    t0 = time.perf_counter()
    for _ in range(30):
        r = f_bvh(ov, dv, alive0, t_init)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 30
    print(f"dead  block_r={block_r}: {dt*1e3:.3f} ms")


if len(sys.argv) > 3 and sys.argv[3] == "floor":
    floor_probe(int(sys.argv[1]), int(sys.argv[2]))
