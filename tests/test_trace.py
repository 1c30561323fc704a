"""End-to-end render-step tests: camera rays, accumulation, materials, sky."""
import numpy as np
import jax.numpy as jnp

from simple_raytracer_tpu import Camera, Material, Renderer, RenderOptions, Scene
from simple_raytracer_tpu.ops.camera import camera_rotation, rotate_vec
from simple_raytracer_tpu.ops.tonemap import aces, tonemap_u8
from simple_raytracer_tpu.ops.vec import Vec3


def small_options(**kw):
    defaults = dict(width=32, height=24, num_samples=1, num_bounces=3)
    defaults.update(kw)
    return RenderOptions(**defaults)


def test_camera_rotation_identity():
    rot = camera_rotation(jnp.float32(0.0), jnp.float32(0.0))
    v = rotate_vec(rot, Vec3(jnp.float32(1.0), jnp.float32(2.0), jnp.float32(-3.0)))
    np.testing.assert_allclose([v.x, v.y, v.z], [1.0, 2.0, -3.0], atol=1e-6)


def test_camera_rotation_yaw_90():
    # yaw rotates around +Y: forward (-z) turns toward -x
    rot = camera_rotation(jnp.float32(np.pi / 2), jnp.float32(0.0))
    v = rotate_vec(rot, Vec3(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-1.0)))
    np.testing.assert_allclose([v.x, v.y, v.z], [-1.0, 0.0, 0.0], atol=1e-6)


def test_aces_range_and_tonemap_pack():
    x = jnp.asarray(np.linspace(0, 20, 64, dtype=np.float32))
    y = np.asarray(aces(x))
    assert (y >= 0).all() and (y <= 1).all()
    canvas = jnp.ones((4, 4, 3), jnp.float32) * 2.0  # 2 steps of white
    img = np.asarray(tonemap_u8(canvas, 2))
    assert img.dtype == np.uint8
    # aces(1.0) = (2.54)/(3.16) ~= 0.8038; sqrt -> ~0.8966; *255 floor -> 228
    assert img[0, 0, 0] == int(np.sqrt(np.float32(2.54 / 3.16)) * 255)


def test_render_emissive_sphere_direct():
    """A purely emissive sphere on a black sky must produce its emission
    color at the center pixel and zero where nothing is hit."""
    sc = Scene()
    sc.sky = type(sc.sky)(sun_intensity=0.0)  # keep defaults but no sun
    sc.skybox = np.zeros((8, 16, 3), np.float32)
    m = sc.add_material(Material(color=(1, 0, 0), emission=(1.0, 0.25, 0.0),
                                 emission_strength=2.0))
    sc.add_sphere((0, 0, 0), 1.0, material=m)
    r = Renderer(small_options(), scene=sc)
    cam = Camera(position=(0, 0, 5))
    img = r.render(cam, num_steps=1)
    h, w = img.shape[:2]
    center = np.asarray(r.canvas)[h // 2, w // 2]
    # first-hit emission: mask(1) * emission * strength
    np.testing.assert_allclose(center, [2.0, 0.5, 0.0], rtol=1e-5)
    corner = np.asarray(r.canvas)[0, 0]
    np.testing.assert_allclose(corner, 0.0, atol=1e-6)


def test_sky_only_render_matches_skybox():
    sc = Scene()
    sc.sky = type(sc.sky)(sun_intensity=0.0)
    sc.skybox = np.full((8, 16, 3), 0.25, np.float32)
    r = Renderer(small_options(num_bounces=2), scene=sc)
    img0 = r.render(Camera(position=(0, 0, 5)), num_steps=1)
    np.testing.assert_allclose(np.asarray(r.canvas), 0.25, rtol=1e-5)


def test_progressive_accumulation_mean():
    """Canvas holds the SUM over steps; image divides by num_steps
    (render.cl:525-535 semantics via time_not_moved)."""
    sc = Scene()
    sc.sky = type(sc.sky)(sun_intensity=0.0)
    sc.skybox = np.full((4, 8, 3), 0.5, np.float32)
    r = Renderer(small_options(num_bounces=1), scene=sc)
    cam = Camera()
    r.step(cam)
    c1 = np.asarray(r.canvas).copy()
    r.step(cam)
    c2 = np.asarray(r.canvas)
    np.testing.assert_allclose(c2, 2 * c1, rtol=1e-5)
    assert r.num_steps == 2
    r.clear_canvas()
    assert r.num_steps == 0
    np.testing.assert_allclose(np.asarray(r.canvas), 0.0)


def test_show_normals_mode():
    sc = Scene()
    sc.skybox = np.zeros((4, 8, 3), np.float32)
    sc.add_sphere((0, 0, 0), 1.0)
    r = Renderer(small_options(show_normals=True), scene=sc)
    cam = Camera(position=(0, 0, 5))
    r.step(cam)
    h, w = small_options().height, small_options().width
    center = np.asarray(r.canvas)[h // 2, w // 2]
    # center of the sphere faces the camera: normal ~ (0,0,1) -> 0.5,0.5,1.0
    # (loose tolerance: at 32x24 / 90deg fov one pixel spans several degrees
    # and the jittered sample lands anywhere inside it)
    np.testing.assert_allclose(center, [0.5, 0.5, 1.0], atol=0.15)


def test_determinism_same_time():
    sc = Scene()
    sc.add_sphere((0, 0, 0), 1.0)
    r1 = Renderer(small_options(), scene=sc)
    r2 = Renderer(small_options(), scene=sc)
    cam = Camera(position=(0, 0, 5))
    r1.step(cam, time=77)
    r2.step(cam, time=77)
    np.testing.assert_array_equal(np.asarray(r1.canvas), np.asarray(r2.canvas))


def test_mirror_sphere_reflects():
    """A perfectly smooth specular sphere in front of an emissive wall:
    reflected rays must pick up the wall's emission untinted."""
    sc = Scene()
    sc.sky = type(sc.sky)(sun_intensity=0.0)
    sc.skybox = np.zeros((4, 8, 3), np.float32)
    wall = sc.add_material(Material(emission=(0, 1, 0), emission_strength=1.0))
    mirror = sc.add_material(Material(color=(1, 0, 0), smoothness=1.0,
                                      specular=1.0))
    sc.add_plane((0, 0, 6), (0, 0, -1), material=wall)  # behind the camera
    sc.add_sphere((0, 0, 0), 1.0, material=mirror)
    r = Renderer(small_options(num_bounces=3), scene=sc)
    cam = Camera(position=(0, 0, 5))
    r.step(cam, time=5)
    h, w = small_options().height, small_options().width
    center = np.asarray(r.canvas)[h // 2, w // 2]
    # specular reflection is untinted (render.cl:436): green survives
    np.testing.assert_allclose(center, [0, 1, 0], atol=1e-4)


def test_checkpoint_roundtrip():
    sc = Scene()
    sc.add_sphere((0, 0, 0), 1.0)
    r = Renderer(small_options(), scene=sc)
    cam = Camera(position=(0, 0, 5))
    r.step(cam, time=3)
    state = r.state_dict()
    r2 = Renderer(small_options(), scene=sc)
    r2.load_state_dict(state)
    np.testing.assert_array_equal(r2.image(), r.image())
    assert r2.num_steps == r.num_steps


def test_tile_untile_image_roundtrip():
    """tile_image/untile_image are exact inverses (the engine's internal
    tile-order canvas relies on this at image/checkpoint boundaries)."""
    import numpy as np

    from simple_raytracer_tpu.ops.camera import (tile_image, untile_image,
                                                 tiled_pixel_order)

    h, w, tile = 32, 128, (8, 64)
    img = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
    np.testing.assert_array_equal(untile_image(tile_image(img, tile), tile),
                                  img)
    # tile_image matches the ray enumeration: flat tiled canvas position j
    # holds the pixel tiled_pixel_order[j]
    order = np.asarray(tiled_pixel_order(w, h, tile))
    flat = img.reshape(h * w, 3)
    np.testing.assert_array_equal(
        np.asarray(tile_image(img, tile)).reshape(h * w, 3), flat[order])


def test_checkpoint_roundtrip_with_tiled_canvas():
    """state_dict/load_state_dict speak row-major regardless of the
    internal tile-order accumulation (checkpoints stay portable)."""
    import numpy as np

    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import config2_four_spheres

    scene, camera, _ = config2_four_spheres(width=64, height=16)
    opts = RenderOptions(width=64, height=16, num_samples=1, num_bounces=2)
    r = Renderer(opts, scene=scene)
    assert r._tile is not None          # 64x16 divides the (8, 64) tile
    r.step(camera, time=3)
    img = r.image()
    st = r.state_dict()

    r2 = Renderer(opts, scene=scene)
    r2.load_state_dict(st)
    np.testing.assert_array_equal(r2.image(), img)
    np.testing.assert_array_equal(np.asarray(r2.canvas), np.asarray(r.canvas))

    # a renderer with tiling disabled loads the same checkpoint
    r3 = Renderer(RenderOptions(width=64, height=16, num_samples=1,
                                num_bounces=2, ray_tile=None), scene=scene)
    r3.load_state_dict(st)
    np.testing.assert_array_equal(r3.image(), img)
