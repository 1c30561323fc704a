"""Property tests (SURVEY §4): physical invariants of the renderer."""
import numpy as np
import jax.numpy as jnp

from simple_raytracer_tpu import Camera, Material, Renderer, RenderOptions, Scene
from simple_raytracer_tpu.models.meshgen import icosphere, torus
from simple_raytracer_tpu.ops.bsdf import (MatFields, sample_material,
                                           shlick_reflectance)
from simple_raytracer_tpu.ops.intersect import closest_hit
from simple_raytracer_tpu.ops.vec import Vec3, dot, length


def _rays(n, seed=0, origin_box=3.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-origin_box, origin_box, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d))


def _mixed_scene():
    sc = Scene()
    sc.add_sphere((0, 0, 0), 1.0)
    sc.add_sphere((2.5, 0.5, -1), 0.7)
    sc.add_plane((0, -2, 0), (0, 1, 0))
    pos, nrm = torus()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    return sc.build()


def test_hit_normals_unit_length():
    ds = _mixed_scene()
    o, d = _rays(3000)
    hit = closest_hit(ds, o, d)
    h = np.asarray(hit.hit)
    l = np.asarray(length(hit.normal))[h]
    np.testing.assert_allclose(l, 1.0, atol=1e-4)


def test_hit_normals_face_the_ray():
    # normal is always flipped toward the incoming ray (render.cl:373-374)
    ds = _mixed_scene()
    o, d = _rays(3000, seed=1)
    hit = closest_hit(ds, o, d)
    h = np.asarray(hit.hit)
    nd = np.asarray(dot(hit.normal, d))[h]
    assert (nd <= 1e-6).all()


def test_hit_position_on_ray():
    ds = _mixed_scene()
    o, d = _rays(2000, seed=2)
    hit = closest_hit(ds, o, d)
    h = np.asarray(hit.hit)
    t = np.asarray(hit.t)
    px = np.asarray(o.x + d.x * t)[h]
    want = np.asarray(hit.position.x)[h]
    np.testing.assert_allclose(px, want, rtol=1e-5, atol=1e-5)


def test_energy_non_increasing_without_emission():
    """A scene with no emissive materials and a black sky cannot produce
    radiance: the path throughput only multiplies by albedo <= 1."""
    sc = Scene()
    sc.materials.materials[0] = Material(color=(0.8, 0.8, 0.8))
    sc.sky = type(sc.sky)(sun_intensity=0.0,
                          horizon_color=(0, 0, 0), zenith_color=(0, 0, 0),
                          ground_color=(0, 0, 0))
    sc.add_sphere((0, 0, -3), 1.0)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    r = Renderer(RenderOptions(width=32, height=24, num_samples=2,
                               num_bounces=8), scene=sc)
    r.step(Camera(), time=11)
    c = np.asarray(r.canvas)
    assert (c >= 0).all() and (c <= 1e-6).all()


def test_radiance_bounded_by_sky_for_diffuse_white():
    """White diffuse scene under a uniform sky: radiance cannot exceed the
    sky radiance anywhere (throughput <= 1)."""
    sc = Scene()
    sc.skybox = np.full((8, 16, 3), 0.75, np.float32)
    sc.sky = type(sc.sky)(sun_intensity=0.0)
    sc.add_sphere((0, 0, -3), 1.0)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    r = Renderer(RenderOptions(width=32, height=24, num_samples=2,
                               num_bounces=6), scene=sc)
    r.step(Camera(), time=13)
    c = np.asarray(r.canvas)
    assert (c <= 0.75 + 1e-5).all()


def _mat_fields(n, **kw):
    f = lambda name, default: jnp.full((n,), np.float32(kw.get(name, default)))
    c = Vec3(f("cr", 1.0), f("cg", 1.0), f("cb", 1.0))
    e = Vec3(f("er", 0.0), f("eg", 0.0), f("eb", 0.0))
    return MatFields(smoothness=f("smoothness", 0.0),
                     metallic=f("metallic", 0.0),
                     specular=f("specular", 0.0),
                     emission_strength=f("emission_strength", 0.0),
                     transmittance=f("transmittance", 0.0),
                     refraction_index=f("refraction_index", 1.5),
                     color=c, emission=e)


def test_tir_grazing_rays_reflect():
    """Rays inside glass (front=False) at grazing angles must totally
    internally reflect: outgoing direction equals the mirror direction."""
    n = 512
    rng = np.random.default_rng(4)
    # normal = +y (already flipped toward the ray), rays nearly parallel
    # to the surface from inside (ior 1.5 -> TIR beyond ~41.8 deg)
    normal = Vec3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    theta = rng.uniform(np.deg2rad(80), np.deg2rad(89), n)  # from normal
    phi = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(theta) * np.cos(phi), -np.cos(theta),
                  np.sin(theta) * np.sin(phi)], -1).astype(np.float32)
    din = Vec3.from_array(jnp.asarray(d))
    pos = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    front = jnp.zeros(n, bool)  # inside the medium
    mat = _mat_fields(n, transmittance=1.0, smoothness=1.0)
    seeds = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    ms = sample_material(pos, normal, front, din, mat, seeds)
    # mirror reflection about +y: (dx, -dy, dz) -> (dx, +|dy|, dz)
    np.testing.assert_allclose(np.asarray(ms.direction.x), d[:, 0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms.direction.y), -d[:, 1],
                               atol=1e-5)


def test_schlick_limits():
    # normal incidence: r0 = ((1-mu)/(1+mu))^2 ; grazing: -> 1
    r0 = shlick_reflectance(jnp.float32(1.5), jnp.float32(1.0))
    np.testing.assert_allclose(float(r0), ((1 - 1.5) / (1 + 1.5)) ** 2,
                               rtol=1e-6)
    r_graze = shlick_reflectance(jnp.float32(1.5), jnp.float32(0.0))
    np.testing.assert_allclose(float(r_graze), 1.0, atol=1e-6)


def test_smooth_mirror_is_deterministic():
    """smoothness=1, specular=1 must be an exact mirror regardless of RNG."""
    n = 256
    rng = np.random.default_rng(5)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:, 1] = -np.abs(d[:, 1]) - 0.1  # downward
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    din = Vec3.from_array(jnp.asarray(d))
    normal = Vec3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    pos = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    front = jnp.ones(n, bool)
    mat = _mat_fields(n, smoothness=1.0, specular=1.0)
    seeds = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    ms = sample_material(pos, normal, front, din, mat, seeds)
    refl = d - 2 * d[:, 1:2] * np.array([[0, 1, 0]], np.float32)
    refl /= np.linalg.norm(refl, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ms.direction.to_array()), refl,
                               atol=1e-5)


def test_acne_offset_sign_follows_direction():
    n = 128
    rng = np.random.default_rng(6)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    din = Vec3.from_array(jnp.asarray(d))
    normal = Vec3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    pos = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    front = jnp.ones(n, bool)
    mat = _mat_fields(n)  # pure diffuse
    seeds = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    ms = sample_material(pos, normal, front, din, mat, seeds)
    oy = np.asarray(ms.origin.y)
    dy = np.asarray(ms.direction.y)
    # origin shifted 0.001 along the normal, sign following the new dir
    np.testing.assert_allclose(oy, np.sign(dy) * 0.001, atol=1e-7)


def test_organic_blob_mesh_properties():
    """The Suzanne stand-in must be watertight-derived (shared topology),
    non-convex, deterministic, with unit smooth normals."""
    from simple_raytracer_tpu.models.meshgen import organic_blob

    p1, n1 = organic_blob(subdivisions=2)
    p2, n2 = organic_blob(subdivisions=2)
    np.testing.assert_array_equal(p1, p2)   # deterministic
    np.testing.assert_array_equal(n1, n2)
    assert p1.shape == (320, 3, 3)
    lens = np.linalg.norm(n1.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # non-convex: radius from centroid varies a lot and some vertices lie
    # well inside the max-radius sphere of their neighbors
    v = p1.reshape(-1, 3)
    r = np.linalg.norm(v - v.mean(axis=0), axis=1)
    assert r.max() / r.min() > 1.5
    # smooth shading: adjacent faces sharing a vertex position share the
    # vertex normal (soup built from shared topology)
    key = np.round(v, 5)
    _, inv = np.unique(key, axis=0, return_inverse=True)
    nn = n1.reshape(-1, 3)
    for vid in np.unique(inv)[:20]:
        rows = nn[inv == vid]
        assert np.abs(rows - rows[0]).max() < 1e-6
