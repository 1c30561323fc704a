"""Pallas triangle-kernel parity vs the jnp path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.ops.intersect import intersect_triangles
from simple_raytracer_tpu.ops.pallas.triangle_kernel import (
    intersect_triangles_pallas, pack_triangles)
from simple_raytracer_tpu.ops.vec import Vec3


def _scene_with_tris(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    pos = (rng.uniform(-4, 4, (n_tris, 1, 3))
           + rng.normal(0, 0.8, (n_tris, 3, 3))).astype(np.float32)
    nrm = np.broadcast_to(np.array([0, 0, 1], np.float32),
                          (n_tris, 3, 3)).copy()
    sc = Scene()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    return sc.build()


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d)))


@pytest.mark.parametrize("n_tris,n_rays", [(37, 300), (300, 513)])
def test_pallas_matches_jnp(n_tris, n_rays):
    ds = _scene_with_tris(n_tris)
    o, d = _rays(n_rays)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    t_k, i_k = intersect_triangles_pallas(
        o, d, pack_triangles(ds.triangles), block_r=128, block_t=128,
        interpret=True)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.isfinite(t_k))
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)  # fma reassoc
    np.testing.assert_array_equal(np.asarray(i_k)[hit],
                                  np.asarray(i_ref)[hit])


def test_pallas_padding_inactive():
    # padded triangle slots (active=0) must never win
    ds = _scene_with_tris(5)
    o, d = _rays(64)
    t_k, i_k = intersect_triangles_pallas(
        o, d, pack_triangles(ds.triangles), block_r=64, block_t=128,
        interpret=True)
    i_k = np.asarray(i_k)
    hit = np.isfinite(np.asarray(t_k))
    assert (i_k[hit] < 5).all()
