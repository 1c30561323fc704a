"""RNG parity tests vs a scalar NumPy oracle of render.cl:143-163."""
import numpy as np
import jax.numpy as jnp

from simple_raytracer_tpu.ops import rng
from simple_raytracer_tpu.ops.vec import Vec3, dot, length

from conftest import ref_random_float


def test_uniform_bit_parity():
    seeds = np.array([1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF, 747796405],
                     dtype=np.uint32)
    s, u = rng.next_uniform(jnp.asarray(seeds))
    for i, seed0 in enumerate(seeds):
        seed_ref, u_ref = ref_random_float(int(seed0))
        assert int(s[i]) == seed_ref
        assert np.float32(u[i]) == u_ref


def test_uniform_sequence_parity():
    seed0 = 987654321
    s = jnp.asarray(np.array([seed0], np.uint32))
    ref_seed = seed0
    for _ in range(20):
        s, u = rng.next_uniform(s)
        ref_seed, u_ref = ref_random_float(ref_seed)
        assert int(s[0]) == ref_seed
        assert np.float32(u[0]) == u_ref


def test_uniform_range():
    seeds = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**32, size=10000, dtype=np.uint32))
    _, u = rng.next_uniform(seeds)
    u = np.asarray(u)
    assert (u >= 0.0).all() and (u < 1.0).all()
    assert abs(u.mean() - 0.5) < 0.02


def test_normal_moments():
    seeds = jnp.asarray(np.random.default_rng(1).integers(
        0, 2**32, size=100000, dtype=np.uint32))
    _, n = rng.next_normal(seeds)
    n = np.asarray(n)
    n = n[np.isfinite(n)]  # log(0) can yield inf, exactly like the reference
    assert abs(n.mean()) < 0.02
    assert abs(n.std() - 1.0) < 0.02


def test_direction_unit_length():
    seeds = jnp.asarray(np.random.default_rng(2).integers(
        0, 2**32, size=1000, dtype=np.uint32))
    _, d = rng.next_direction(seeds)
    l = np.asarray(length(d))
    ok = np.isfinite(l)
    assert ok.mean() > 0.99
    np.testing.assert_allclose(l[ok], 1.0, rtol=1e-5)


def test_hemisphere_sign():
    seeds = jnp.asarray(np.random.default_rng(3).integers(
        0, 2**32, size=1000, dtype=np.uint32))
    n = Vec3(jnp.zeros(1000), jnp.ones(1000), jnp.zeros(1000))
    _, d = rng.next_direction_hemisphere(n, seeds)
    dn = np.asarray(dot(n, d))
    dn = dn[np.isfinite(dn)]
    assert (dn >= 0.0).all()


def test_pixel_seed_wrapping():
    # (sample + id*S) * time * 5304 in wrapping uint32 (render.cl:496)
    s = rng.pixel_seed(3, jnp.asarray(np.array([123456], np.uint32)), 4, 99999)
    expected = ((3 + 123456 * 4) * 99999 * 5304) & 0xFFFFFFFF
    assert int(s[0]) == expected
