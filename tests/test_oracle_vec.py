"""render_vec must reproduce the scalar oracle BIT-EXACTLY.

The vectorized oracle exists so PARITY.md can run the oracle comparison
at the full 960x540 showcase resolution; its evidence value rests
entirely on being the same function as the scalar oracle (same f32
expression order, same per-lane RNG streams).  Pure NumPy — no JAX."""
import numpy as np
import pytest

import oracle
from simple_raytracer_tpu.models.materials import Material
from simple_raytracer_tpu.models.camera import Camera
from simple_raytracer_tpu.models.scene import Scene


def _mixed_scene():
    """Every BSDF arm + every primitive kind + gradient sky."""
    sc = Scene()
    glass = sc.add_material(
        Material(color=(0.9, 0.95, 1.0), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    metal = sc.add_material(
        Material(color=(0.9, 0.6, 0.2), smoothness=0.85, metallic=1.0),
        "Metal")
    spec = sc.add_material(
        Material(color=(0.2, 0.8, 0.3), smoothness=0.95, specular=0.6),
        "Spec")
    glow = sc.add_material(
        Material(emission=(1.0, 0.8, 0.6), emission_strength=3.0), "Glow")
    sc.add_plane((0, -1, 0), (0, 1, 0))
    sc.add_sphere((-1.2, 0.0, -4.0), 0.9, material=glass)
    sc.add_sphere((1.1, 0.2, -4.5), 1.0, material=metal)
    sc.add_sphere((0.0, -0.6, -3.0), 0.4, material=glow)
    sc.add_box((0.2, 1.4, -5.0), size=(1.2, 0.8, 1.0), material=spec)
    return sc, Camera(position=(0.0, 0.3, 1.5))


def _skybox_scene():
    sc, cam = _mixed_scene()
    rng = np.random.default_rng(7)
    sc.skybox = rng.random((8, 16, 3), np.float32) * 2.0
    return sc, cam


@pytest.mark.parametrize("build,time,normals", [
    (_mixed_scene, 1000, False),
    (_mixed_scene, 7, False),
    (_mixed_scene, 1000, True),
    (_skybox_scene, 1000, False),
])
def test_render_vec_bit_exact(build, time, normals):
    sc, cam = build()
    w, h, s, b = 20, 14, 2, 6
    a = oracle.render(sc, cam, w, h, s, b, time, show_normals=normals)
    v = oracle.render_vec(sc, cam, w, h, s, b, time, show_normals=normals)
    assert a.dtype == v.dtype == np.float32
    mismatch = np.flatnonzero(a != v)
    assert mismatch.size == 0, (
        f"{mismatch.size}/{a.size} components differ; "
        f"max abs diff {np.abs(a - v).max()}")
