"""Clustered packet-culling kernel parity vs the dense jnp path."""
import numpy as np
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.ops.intersect import intersect_triangles
from simple_raytracer_tpu.ops.pallas.cluster_kernel import (
    intersect_triangles_clustered)
from simple_raytracer_tpu.ops.vec import Vec3


def _mesh_scene():
    pos, nrm = icosphere(subdivisions=2)  # 320 tris
    sc = Scene()
    sc.cluster_threshold = 64  # force clustering for the small test mesh
    sc.cluster_size = 64
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    return sc.build()


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d)))


def test_clustered_matches_dense():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    assert cl is not None
    o, d = _rays(700)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_k, i_k = intersect_triangles_clustered(o, d, alive, cl.aabb, cl.table,
                                             block_r=128, interpret=True)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.isfinite(t_k))
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_k)[hit],
                                  np.asarray(i_ref)[hit])


def test_clustered_dead_rays_miss():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(256)
    alive = jnp.zeros_like(o.x)  # every ray dead -> all blocks skipped
    t_k, _ = intersect_triangles_clustered(o, d, alive, cl.aabb, cl.table,
                                           block_r=128, interpret=True)
    assert np.isinf(np.asarray(t_k)).all()


def test_clustered_rays_from_inside_mesh():
    # bounce rays originate on the surface (origin inside cluster AABBs)
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    rng = np.random.default_rng(9)
    o_arr = rng.normal(size=(300, 3)).astype(np.float32)
    o_arr /= np.linalg.norm(o_arr, axis=1, keepdims=True)  # on unit sphere
    d_arr = rng.normal(size=(300, 3)).astype(np.float32)
    d_arr /= np.linalg.norm(d_arr, axis=1, keepdims=True)
    o = Vec3.from_array(jnp.asarray(o_arr * 0.999))
    d = Vec3.from_array(jnp.asarray(d_arr))
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_k, i_k = intersect_triangles_clustered(o, d, alive, cl.aabb, cl.table,
                                             block_r=128, interpret=True)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.isfinite(t_k))
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)


def test_end_to_end_clustered_render_matches_jnp():
    """Full render through the engine: clustered backend == jnp backend."""
    from simple_raytracer_tpu import Camera, Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import config4_mesh_glass

    scene, camera, _ = config4_mesh_glass(width=48, height=32)
    opts_j = RenderOptions(width=48, height=32, num_samples=1, num_bounces=3,
                           tri_backend="jnp")
    r1 = Renderer(opts_j, scene=scene)
    r1.step(camera, time=9)

    # interpret-mode clustered run (CPU) — patch the kernel entry to
    # interpret since RenderOptions has no interpret flag
    import simple_raytracer_tpu.ops.pallas.cluster_kernel as ck
    orig = ck.intersect_triangles_clustered

    def interp(o, d, alive, aabb, table, block_r=512, interpret=False):
        return orig(o, d, alive, aabb, table, block_r=block_r,
                    interpret=True)

    ck.intersect_triangles_clustered = interp
    try:
        opts_c = RenderOptions(width=48, height=32, num_samples=1,
                               num_bounces=3, tri_backend="clustered")
        r2 = Renderer(opts_c, scene=scene)
        r2.step(camera, time=9)
    finally:
        ck.intersect_triangles_clustered = orig

    a, b = np.asarray(r1.canvas), np.asarray(r2.canvas)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
