"""BVH builder + native library tests."""
import numpy as np
import pytest

from simple_raytracer_tpu import accel
from simple_raytracer_tpu.models.meshgen import icosphere, torus


def random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 1, 3)).astype(np.float32)
    return base + rng.normal(0, 0.5, (n, 3, 3)).astype(np.float32)


@pytest.mark.parametrize("force_python", [True, False])
def test_bvh_invariants(force_python):
    if not force_python and not accel.native_available():
        if not accel.build_native():
            pytest.skip("native lib unavailable")
    pos = random_tris(500)
    bvh = accel.build_bvh(pos, leaf_size=4, force_python=force_python)
    assert bvh.num_nodes >= 1
    accel.validate_bvh(bvh, pos)
    # root box must contain everything
    lo = bvh.nodes[0, :3]
    hi = bvh.nodes[0, 3:6]
    assert (pos.reshape(-1, 3) >= lo - 1e-4).all()
    assert (pos.reshape(-1, 3) <= hi + 1e-4).all()


def test_bvh_mesh():
    pos, _ = icosphere(subdivisions=3)
    bvh = accel.build_bvh(pos, leaf_size=8)
    accel.validate_bvh(bvh, pos)
    # SAH tree over a closed surface should be reasonably deep
    assert bvh.num_nodes > 10


def test_bvh_single_triangle():
    pos = random_tris(1)
    bvh = accel.build_bvh(pos)
    assert bvh.num_nodes == 1
    assert bvh.meta[0, 3] == 1 and bvh.meta[0, 2] == 1


def test_bvh_empty():
    bvh = accel.build_bvh(np.zeros((0, 3, 3), np.float32))
    assert bvh.num_nodes == 0


@pytest.mark.parametrize("k", [4, 16, 64, 256])
def test_clusters_cover_every_triangle_once(k):
    """No silent truncation: the union of cluster slots is exactly the
    triangle set, each exactly once (oversized leaves must split)."""
    pos = random_tris(333, seed=3)
    cl = accel.build_clusters(pos, k=k)
    flat = cl.slots[cl.slots >= 0]
    assert sorted(flat.tolist()) == list(range(333))
    # every slot index must point inside the reordered array
    assert flat.max() < 333
    assert sorted(cl.order.tolist()) == list(range(333))


def test_transform_native_matches_python():
    if not accel.native_available() and not accel.build_native():
        pytest.skip("native lib unavailable")
    pos, nrm = torus()
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 2]], np.float32)
    m[:3, 3] = [1, 2, 3]
    p1, n1, (lo1, hi1) = accel.transform_triangles(pos, nrm, m)
    p2, n2, (lo2, hi2) = accel.transform_triangles(pos, nrm, m,
                                                   force_python=True)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(n1, n2, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(lo1, lo2, rtol=1e-6)
    np.testing.assert_allclose(hi1, hi2, rtol=1e-6)


def test_stl_native_matches_python(tmp_path):
    if not accel.native_available() and not accel.build_native():
        pytest.skip("native lib unavailable")
    from simple_raytracer_tpu.io.stl import load_stl_model, save_stl
    from simple_raytracer_tpu.models.shapes import TrianglePool

    pos = random_tris(33, seed=3)
    path = tmp_path / "m.stl"
    save_stl(path, pos)
    pool = TrianglePool()
    load_stl_model(path, pool)
    parsed = accel.parse_stl_native(path.read_bytes())
    assert parsed is not None
    np.testing.assert_array_equal(parsed[0], pool.positions)
    np.testing.assert_array_equal(parsed[1], pool.normals)


def test_stl_native_truncated():
    if not accel.native_available() and not accel.build_native():
        pytest.skip("native lib unavailable")
    assert accel.parse_stl_native(b"short") is None


def test_refit_clusters_bounds_moved_triangles():
    """refit_clusters reuses topology but every new AABB must bound its
    cluster's triangles at the NEW positions (conservative culling)."""
    rng = np.random.RandomState(3)
    pos = rng.rand(700, 3, 3).astype(np.float32) * 4.0
    cl = accel.build_clusters(pos, k=32)
    moved = (pos + rng.rand(700, 1, 3).astype(np.float32) * 10.0 - 5.0)
    rf = accel.refit_clusters(cl, moved)
    assert rf.slots is cl.slots and rf.order is cl.order
    rp = moved[rf.order]
    for c in range(rf.aabb.shape[0]):
        idx = rf.slots[c][rf.slots[c] >= 0]
        if idx.size == 0:
            continue
        v = rp[idx].reshape(-1, 3)
        assert (v >= rf.aabb[c, 0:3] - 1e-5).all()
        assert (v <= rf.aabb[c, 3:6] + 1e-5).all()


def test_scene_refit_render_matches_rebuild():
    """A transform edit rendered through build(refit=True) must match the
    full rebuild exactly (culling is result-neutral)."""
    import jax.numpy as jnp

    from simple_raytracer_tpu.models.presets import CONFIGS
    from simple_raytracer_tpu.models.shapes import transform_trs
    from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
    from simple_raytracer_tpu.ops.intersect import closest_hit

    scene, camera, _ = CONFIGS[5]()
    scene.build()                                # prime the topology cache
    scene.set_model_transform(scene.models[0],
                              transform_trs((0.5, 0.2, -0.3)))
    ds_refit = scene.build(refit=True)
    ds_full = scene.build()
    assert ds_refit.triangles.clusters is not None
    cam = camera.state(16 / 9)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, _ = generate_rays(64, 36, 1, jnp.uint32(5), cam.position, rot,
                            cam.aspect_ratio, cam.fov_scale)
    h1 = closest_hit(ds_refit, o, d, tri_backend="jnp")
    h2 = closest_hit(ds_full, o, d, tri_backend="jnp")
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-6)


def test_cluster_count_stable_across_transform_edits():
    """Bucket padding keeps the kernel table SHAPE (a jit cache key)
    stable when a transform edit changes the raw cluster count."""
    from simple_raytracer_tpu.models.presets import CONFIGS
    from simple_raytracer_tpu.models.shapes import transform_trs

    scene, _, _ = CONFIGS[5]()
    s1 = scene.build().triangles.clusters.table_t.shape
    scene.set_model_transform(scene.models[0],
                              transform_trs((3.0, 1.0, -2.0),
                                            scale=(1.7, 0.4, 1.1)))
    s2 = scene.build().triangles.clusters.table_t.shape
    assert s1 == s2
