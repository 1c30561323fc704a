"""Cross-validation: the vectorized TPU pipeline vs the independent scalar
oracle (tests/oracle.py, a direct per-pixel realization of the render.cl
formulas).

Agreement here validates the full chain — seeds, camera, intersection,
material lattice, RNG draw order, sky, accumulation — against a second
implementation that shares no compute code.  Tolerances allow for fp
reassociation (XLA fma/fusion vs scalar numpy) plus the rare pixel where a
1-ulp difference in a transcendental flips a stochastic branch; those
pixels differ wildly, so they are counted, not averaged.
"""
import numpy as np
import pytest

from simple_raytracer_tpu import Camera, Material, Renderer, RenderOptions, Scene

import oracle


def compare(scene, camera, width=16, height=12, samples=2, bounces=4,
            time=777, show_normals=False, outlier_budget=0.01):
    opts = RenderOptions(width=width, height=height, num_samples=samples,
                         num_bounces=bounces, show_normals=show_normals)
    r = Renderer(opts, scene=scene)
    r.step(camera, time=time)
    got = np.asarray(r.canvas)
    want = oracle.render(scene, camera, width, height, samples, bounces,
                         time, show_normals=show_normals)
    close = np.isclose(got, want, rtol=2e-3, atol=2e-3).all(axis=-1)
    frac_bad = 1.0 - close.mean()
    assert frac_bad <= outlier_budget, (
        f"{frac_bad:.2%} of pixels disagree with the scalar oracle "
        f"(max abs diff {np.abs(got - want).max()})")


def test_oracle_sky_only():
    sc = Scene()
    compare(sc, Camera(), bounces=2, outlier_budget=0.0)


def test_oracle_diffuse_sphere_and_plane():
    sc = Scene()
    red = sc.add_material(Material(color=(0.8, 0.2, 0.2)))
    sc.add_plane((0, -1, 0), (0, 1, 0))
    sc.add_sphere((0, 0, -3), 1.0, material=red)
    compare(sc, Camera(position=(0, 0.5, 3)))


def test_oracle_emissive_and_metal():
    sc = Scene()
    lamp = sc.add_material(Material(emission=(1, 0.8, 0.5),
                                    emission_strength=5.0))
    metal = sc.add_material(Material(color=(0.9, 0.7, 0.3), smoothness=0.8,
                                     metallic=1.0))
    sc.add_sphere((-1.2, 0, -3), 1.0, material=lamp)
    sc.add_sphere((1.2, 0, -3), 1.0, material=metal)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    compare(sc, Camera(position=(0, 0.5, 3)))


def test_oracle_glass():
    sc = Scene()
    glass = sc.add_material(Material(color=(0.95, 0.95, 1.0), smoothness=1.0,
                                     transmittance=1.0,
                                     refraction_index=1.5))
    sc.add_sphere((0, 0, -3), 1.0, material=glass)
    sc.add_plane((0, -1.5, 0), (0, 1, 0))
    compare(sc, Camera(position=(0, 0, 1)), bounces=6, outlier_budget=0.03)


def test_oracle_mesh_smooth_shading():
    sc = Scene()
    from simple_raytracer_tpu.models.meshgen import icosphere
    pos, nrm = icosphere(subdivisions=1)
    span = sc.pool.append(pos, nrm)
    blue = sc.add_material(Material(color=(0.2, 0.3, 0.9)))
    sc.add_model(span, material=blue)
    compare(sc, Camera(position=(0, 0, 3)), bounces=3)


def test_oracle_box_transform():
    sc = Scene()
    sc.add_box((0.5, 0, -3), size=(1.5, 1.0, 1.0))
    compare(sc, Camera(position=(0, 0.5, 1)), bounces=3)


def test_oracle_show_normals():
    sc = Scene()
    sc.add_sphere((0, 0, -3), 1.0)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    compare(sc, Camera(), bounces=4, show_normals=True, outlier_budget=0.0)
