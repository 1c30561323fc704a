"""First-hit AOV render targets (RenderOptions.aov / --aov).

The reference's only introspection view is the show-normals toggle
(interface.cpp:374, render.cl:407-410); depth and albedo extend the same
single-segment mechanism (SURVEY §5 "keep a normals/AOV debug mode as a
first-class render target").
"""
import numpy as np
import pytest

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config2_four_spheres


def _render(aov, steps=1):
    scene, camera, _ = config2_four_spheres(width=96, height=54)
    r = Renderer(RenderOptions(width=96, height=54, num_samples=2,
                               num_bounces=4, aov=aov), scene=scene)
    for t in range(1, steps + 1):
        r.step(camera, time=t)
    return np.asarray(r.canvas) / steps


def test_depth_aov_monotone_and_zero_on_miss():
    depth = _render("depth")
    # grayscale: channels identical
    np.testing.assert_array_equal(depth[..., 0], depth[..., 1])
    np.testing.assert_array_equal(depth[..., 0], depth[..., 2])
    # sky rows (top of frame) miss -> exactly 0; ground plane hits > 0
    assert float(depth[0, :, 0].max()) == 0.0
    assert float(depth[-1, :, 0].min()) > 0.0
    # the plane recedes: bottom rows are closer than mid rows
    assert depth[-1, :, 0].mean() > depth[-12, :, 0].mean()


def test_albedo_aov_is_material_color():
    albedo = _render("albedo")
    # the ground plane (material 0 = the default white material,
    # material.hpp:23-37 defaults) dominates the bottom row: its albedo
    # must equal the material color exactly
    row = albedo[-1]                      # bottom row: all plane hits
    assert (np.abs(row - 1.0) < 1e-6).all()


def test_normals_alias_matches_show_normals():
    a = _render("normals")
    scene, camera, _ = config2_four_spheres(width=96, height=54)
    r = Renderer(RenderOptions(width=96, height=54, num_samples=2,
                               num_bounces=4, show_normals=True),
                 scene=scene)
    r.step(camera, time=1)
    b = np.asarray(r.canvas)
    np.testing.assert_array_equal(a, b)


def test_unknown_aov_rejected():
    with pytest.raises(ValueError):
        Renderer(RenderOptions(aov="beauty-pass"))
