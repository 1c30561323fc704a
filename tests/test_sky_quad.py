"""Quad-packed skybox sampler: lossless packing recovery + sampling
parity with the f32 gather sampler (ops/sky.py:SkyboxTex path).

The packed path exists for TPU performance (one (N, 4)-u32 row gather
per ray instead of four f32x3 tap gathers); these tests pin its
semantics: bit-recovery of u8/RGBE sources and bilinear results equal
to sample_equirect_gather up to pow/ldexp LSBs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu.ops.sky import (
    pack_skybox_quad, sample_equirect_quad, sample_equirect_gather,
    sky_color)
from simple_raytracer_tpu.ops.scene_types import SkyboxTex, SkyParams
from simple_raytracer_tpu.ops.vec import Vec3
from simple_raytracer_tpu.io.image import float_to_rgbe, _rgbe_to_float


def _u8_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    u8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img = np.power(u8.astype(np.float32) / 255.0, np.float32(2.2),
                   dtype=np.float32)
    return u8, img


def _hdr_image(h, w, seed=1):
    rng = np.random.default_rng(seed)
    raw = rng.random((h, w, 3), dtype=np.float32) * 37.5 + 1e-3
    # snap onto the RGBE grid so packing is lossless
    return _rgbe_to_float(float_to_rgbe(raw))


def _sample_points(n, seed=2):
    rng = np.random.default_rng(seed)
    u = np.concatenate([rng.random(n - 8, dtype=np.float32),
                        np.float32([0, 1e-6, 0.9999, 1.0, 0.5, 0, 1, 0.25])])
    v = np.concatenate([rng.random(n - 8, dtype=np.float32),
                        np.float32([0, 1.0, 0, 1.0, 1e-6, 0.5, 0.5, 1.0])])
    return jnp.asarray(u), jnp.asarray(v)


def test_pack_recovers_rgb8():
    u8, img = _u8_image(16, 32)
    tex = pack_skybox_quad(img)
    assert isinstance(tex, SkyboxTex) and tex.mode == "rgb8"
    assert tex.quad.shape == (16, 32, 4)
    # anchor texel of the quad row is the packed source texel
    q00 = np.asarray(tex.quad[..., 0])
    assert np.array_equal(q00 & 0xFF, u8[..., 0].astype(np.uint32))
    assert np.array_equal((q00 >> 8) & 0xFF, u8[..., 1].astype(np.uint32))


def test_pack_recovers_rgbe():
    img = _hdr_image(8, 16)
    tex = pack_skybox_quad(img)
    assert isinstance(tex, SkyboxTex) and tex.mode == "rgbe"


def test_pack_rejects_arbitrary_floats():
    # note 0.75 IS losslessly RGBE-representable (192 * 2^-8); 1/3 is not
    img = np.full((8, 16, 3), 1.0 / 3.0, np.float32)
    assert pack_skybox_quad(img) is None
    rng = np.random.default_rng(3)
    img = (rng.random((8, 16, 3)).astype(np.float32) + 0.5) * 3.0
    assert pack_skybox_quad(img) is None


@pytest.mark.parametrize("kind", ["rgb8", "rgbe"])
def test_quad_sampling_matches_gather(kind):
    if kind == "rgb8":
        _, img = _u8_image(32, 64)
    else:
        img = _hdr_image(32, 64)
    tex = pack_skybox_quad(img)
    assert tex is not None and tex.mode == kind
    sky_f32 = Vec3(jnp.asarray(img[..., 0]), jnp.asarray(img[..., 1]),
                   jnp.asarray(img[..., 2]))
    u, v = _sample_points(4096)
    ref = jax.jit(lambda u, v: sample_equirect_gather(sky_f32, u, v))(u, v)
    got = jax.jit(lambda u, v: sample_equirect_quad(tex, u, v))(u, v)
    scale = float(np.abs(img).max())
    for c in "xyz":
        diff = np.abs(np.asarray(getattr(ref, c) - getattr(got, c)))
        # pow/ldexp LSB drift only; edges included in the sample set
        assert diff.max() <= 1e-5 * max(scale, 1.0), (c, diff.max())


def test_sky_color_dispatches_packed():
    _, img = _u8_image(16, 32)
    tex = pack_skybox_quad(img)
    sky = SkyParams(
        sun_focus=jnp.float32(25.0), sun_intensity=jnp.float32(0.0),
        sun_color=Vec3(*map(jnp.float32, (1, 1, 1))),
        sun_direction=Vec3(*map(jnp.float32, (0, -1, 0))),
        horizon_color=Vec3(*map(jnp.float32, (0, 0, 0))),
        zenith_color=Vec3(*map(jnp.float32, (0, 0, 0))),
        ground_color=Vec3(*map(jnp.float32, (0, 0, 0))))
    n = 257
    rng = np.random.default_rng(5)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dv = Vec3(*[jnp.asarray(d[:, i]) for i in range(3)])
    sky_f32 = Vec3(jnp.asarray(img[..., 0]), jnp.asarray(img[..., 1]),
                   jnp.asarray(img[..., 2]))
    a = jax.jit(lambda dv: sky_color(dv, sky, tex))(dv)
    b = jax.jit(lambda dv: sky_color(dv, sky, sky_f32))(dv)
    for c in "xyz":
        assert np.allclose(np.asarray(getattr(a, c)),
                           np.asarray(getattr(b, c)), atol=1e-5)


def test_scene_build_packs_u8_skybox():
    from simple_raytracer_tpu.models.scene import Scene
    sc = Scene()
    _, img = _u8_image(16, 32)
    sc.skybox = img
    dev = sc.build()
    assert isinstance(dev.skybox, SkyboxTex)
    # cache: same image object -> same device rep (no repack/reupload)
    dev2 = sc.build()
    assert dev2.skybox is dev.skybox
    # arbitrary floats keep the f32 Vec3 path
    sc.skybox = np.full((8, 16, 3), 1.0 / 3.0, np.float32)
    dev3 = sc.build()
    assert isinstance(dev3.skybox, Vec3)


def test_render_pass_with_packed_skybox():
    """End-to-end: a sky-only render through the scan path returns the
    decoded texel values (same contract as test_sky_only_render tests)."""
    from simple_raytracer_tpu.models.scene import Scene
    from simple_raytracer_tpu.models.camera import Camera
    from simple_raytracer_tpu.engine import Renderer, RenderOptions

    sc = Scene()
    u8 = np.full((8, 16, 3), 128, np.uint8)
    img = np.power(u8.astype(np.float32) / 255.0, np.float32(2.2),
                   dtype=np.float32)
    sc.skybox = img
    sc.sky.sun_intensity = 0.0
    opts = RenderOptions(width=8, height=6, num_samples=1, num_bounces=2)
    r = Renderer(opts, scene=sc)
    r.step(Camera(), time=7)
    canvas = np.asarray(r.canvas)
    assert np.isfinite(canvas).all()
    expected = float(img[0, 0, 0])
    assert np.allclose(canvas, expected, atol=1e-5)
