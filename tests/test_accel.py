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
