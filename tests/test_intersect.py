"""Intersection-layer unit tests against analytically known cases
(formulas from render.cl:180-290)."""
import numpy as np
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.ops.intersect import (closest_hit,
                                                intersect_planes,
                                                intersect_spheres,
                                                intersect_triangles)
from simple_raytracer_tpu.ops.vec import Vec3


def rays(origins, dirs):
    o = np.asarray(origins, np.float32).reshape(-1, 3)
    d = np.asarray(dirs, np.float32).reshape(-1, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d))


def test_sphere_hit_miss():
    sc = Scene()
    sc.add_sphere((0, 0, -5), 1.0)
    ds = sc.build()
    o, d = rays([[0, 0, 0], [0, 0, 0], [0, 0, -10]],
                [[0, 0, -1], [0, 1, 0], [0, 0, 1]])
    t, idx = intersect_spheres(o, d, ds.spheres)
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-6)
    assert np.isinf(t[1])
    np.testing.assert_allclose(t[2], 4.0, rtol=1e-6)  # from the other side


def test_sphere_inside_uses_far_root():
    sc = Scene()
    sc.add_sphere((0, 0, 0), 2.0)
    ds = sc.build()
    o, d = rays([[0, 0, 0]], [[1, 0, 0]])
    t, _ = intersect_spheres(o, d, ds.spheres)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)


def test_sphere_behind_misses():
    sc = Scene()
    sc.add_sphere((0, 0, 5), 1.0)
    ds = sc.build()
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    t, _ = intersect_spheres(o, d, ds.spheres)
    assert np.isinf(t[0])


def test_sphere_nearest_of_two():
    sc = Scene()
    sc.add_sphere((0, 0, -10), 1.0)
    sc.add_sphere((0, 0, -4), 1.0)
    ds = sc.build()
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    t, idx = intersect_spheres(o, d, ds.spheres)
    np.testing.assert_allclose(t[0], 3.0, rtol=1e-6)
    assert int(idx[0]) == 1


def test_plane_hit_and_parallel():
    sc = Scene()
    sc.add_plane((0, -1, 0), (0, 1, 0))
    ds = sc.build()
    o, d = rays([[0, 0, 0], [0, 0, 0]], [[0, -1, 0], [1, 0, 0]])
    t, _ = intersect_planes(o, d, ds.planes)
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    assert np.isinf(t[1])  # exactly parallel: denom == 0 -> miss


def test_plane_backward_misses():
    sc = Scene()
    sc.add_plane((0, -1, 0), (0, 1, 0))
    ds = sc.build()
    o, d = rays([[0, 0, 0]], [[0, 1, 0]])
    t, _ = intersect_planes(o, d, ds.planes)
    assert np.isinf(t[0])


def _tri_scene():
    sc = Scene()
    # single triangle in z=-2 plane via a Model with an identity transform
    pos = np.array([[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32)
    nrm = np.broadcast_to(np.array([0, 0, 1], np.float32), (1, 3, 3)).copy()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    return sc.build()


def test_triangle_hit():
    ds = _tri_scene()
    o, d = rays([[0, 0, 0], [0, 0, 0], [5, 5, 0]],
                [[0, 0, -1], [0, 0, 1], [0, 0, -1]])
    t, idx = intersect_triangles(o, d, ds.triangles)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)
    assert np.isinf(t[1])  # behind
    assert np.isinf(t[2])  # outside barycentric range


def test_triangle_edge_inclusive():
    # u in [0,1], v >= 0, u+v <= 1 inclusive (render.cl:260-266)
    ds = _tri_scene()
    o, d = rays([[-1, -1, 0]], [[0, 0, -1]])  # exactly vertex v0
    t, _ = intersect_triangles(o, d, ds.triangles)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)


def test_triangle_chunked_matches_single():
    rng = np.random.default_rng(7)
    n_tris = 37
    pos = rng.normal(size=(n_tris, 3, 3)).astype(np.float32)
    nrm = np.broadcast_to(np.array([0, 0, 1], np.float32),
                          (n_tris, 3, 3)).copy()
    sc = Scene()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    ds = sc.build()
    o, d = rays(rng.normal(size=(50, 3)) * 3, rng.normal(size=(50, 3)))
    t1, i1 = intersect_triangles(o, d, ds.triangles, chunk=1024)
    t2, i2 = intersect_triangles(o, d, ds.triangles, chunk=8)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    hit = np.isfinite(t1)
    np.testing.assert_array_equal(hit, np.isfinite(t2))
    # same math; tolerance covers compiler fp reassociation between the
    # single-shot and chunked-loop programs
    np.testing.assert_allclose(t1[hit], t2[hit], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i2)[hit])


def test_closest_hit_category_select_and_normal_flip():
    sc = Scene()
    sc.add_sphere((0, 0, -3), 1.0)
    sc.add_plane((0, 0, -10), (0, 0, 1))
    ds = sc.build()
    o, d = rays([[0, 0, 0], [0, 2.5, 0]], [[0, 0, -1], [0, 0, -1]])
    hit = closest_hit(ds, o, d)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)  # sphere wins
    np.testing.assert_allclose(hit.t[1], 10.0, rtol=1e-6)  # plane behind it
    # sphere normal points back toward the ray
    np.testing.assert_allclose(
        np.array([hit.normal.x[0], hit.normal.y[0], hit.normal.z[0]]),
        [0, 0, 1], atol=1e-6)
    assert bool(hit.front[0])


def test_normal_flipped_when_inside():
    sc = Scene()
    sc.add_sphere((0, 0, 0), 2.0)
    ds = sc.build()
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    hit = closest_hit(ds, o, d)
    assert not bool(hit.front[0])
    # raw normal would be (0,0,-1); flipped toward ray origin -> (0,0,1)
    np.testing.assert_allclose(hit.normal.z[0], 1.0, atol=1e-6)


def test_triangle_smooth_normal_interpolation():
    sc = Scene()
    pos = np.array([[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32)
    # distinct vertex normals; hit near v2 should pull toward n2
    nrm = np.array([[[0, 0, 1], [0, 0, 1], [1, 0, 0]]], np.float32)
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    ds = sc.build()
    o, d = rays([[0, 0.9, 0]], [[0, 0, -1]])
    hit = closest_hit(ds, o, d)
    assert bool(hit.hit[0])
    # near the top vertex the interpolated normal is dominated by n2=(1,0,0)
    assert float(hit.normal.x[0]) > 0.8


def test_model_transform_applied():
    sc = Scene()
    sc.add_box((5, 0, 0), size=(2, 2, 2))
    ds = sc.build()
    o, d = rays([[5, 0, 5]], [[0, 0, -1]])
    hit = closest_hit(ds, o, d)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(hit.t[0], 4.0, rtol=1e-5)


def test_box_aabb():
    sc = Scene()
    m = sc.add_box((1, 2, 3), size=(2, 4, 6))
    lo, hi = m.bounding_box(sc.pool)
    np.testing.assert_allclose(lo, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hi, [2, 4, 6], atol=1e-6)
