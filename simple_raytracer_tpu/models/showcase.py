"""Reconstructions of the reference's three showcase scenes.

The reference README shows three renders (README.md:5-11,
readme/{red_green,spheres,model}.png) made interactively in its ImGui
editor.  The reference has NO scene serialization ("Scene saving and
loading" is listed as future work, README.md:43), so the exact scene
parameters are unrecoverable; these builders reconstruct each scene
faithfully from the images: same shape inventory, material classes,
lighting setup, and the reference's own skybox
(assets/skybox.png, always loaded by tracer.cpp:42-52).

The model scene uses Suzanne in the reference; no mesh asset ships with
either repo, so a procedural organic sculpt stands in unless a mesh path is
given (the same policy as presets.config4/5).

Each builder returns (scene, camera, options) at the reference's
960x540, 2 samples, 10 bounces defaults (main.cpp:42-46,116-117).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..engine import RenderOptions
from .camera import Camera
from .materials import Material
from .meshgen import organic_blob
from .scene import Scene
from .shapes import transform_trs

REFERENCE_SKYBOX = "/root/reference/assets/skybox.png"


def load_reference_skybox() -> Optional[np.ndarray]:
    """The skybox the reference renders with (tracer.cpp:42), decoded the
    stbi_loadf way; None when the reference checkout isn't present (the
    scene then falls back to the analytic gradient sky)."""
    path = os.environ.get("SRT_REFERENCE_SKYBOX", REFERENCE_SKYBOX)
    if not os.path.exists(path):
        return None
    from ..io.image import load_skybox
    return load_skybox(path)


def _options(**kw) -> RenderOptions:
    defaults = dict(width=960, height=540, num_samples=2, num_bounces=10)
    defaults.update(kw)
    return RenderOptions(**defaults)


def showcase_red_green() -> tuple:
    """readme/red_green.png: a closed white room with a red left wall and
    green right wall, a rectangular ceiling light, two clear spheres (one
    specular, one refractive with its floor caustic) and a large silver
    metallic sphere."""
    sc = Scene()
    white = 0
    red = sc.add_material(Material(color=(0.78, 0.05, 0.04)), "Red")
    green = sc.add_material(Material(color=(0.06, 0.62, 0.04)), "Green")
    light = sc.add_material(
        Material(color=(1, 1, 1), emission=(1.0, 1.0, 1.0),
                 emission_strength=5.0), "Light")
    mirror = sc.add_material(
        Material(color=(1, 1, 1), smoothness=1.0, specular=1.0), "Mirror")
    glass = sc.add_material(
        Material(color=(1, 1, 1), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    silver = sc.add_material(
        Material(color=(0.92, 0.9, 0.85), smoothness=0.92, metallic=1.0),
        "Silver")

    sc.add_plane((0, -2, 0), (0, 1, 0), material=white)    # floor
    sc.add_plane((0, 2.6, 0), (0, -1, 0), material=white)  # ceiling
    sc.add_plane((0, 0, -6), (0, 0, 1), material=white)    # back
    sc.add_plane((0, 0, 5.5), (0, 0, -1), material=white)  # behind camera
    sc.add_plane((-3.6, 0, 0), (1, 0, 0), material=red)    # left
    sc.add_plane((3.6, 0, 0), (-1, 0, 0), material=green)  # right
    # ceiling light panel (an emissive box flush with the ceiling)
    sc.add_box((0, 2.62, -2.6), size=(2.6, 0.15, 2.2), material=light)

    sc.add_sphere((-0.35, 0.35, -3.2), 0.85, material=mirror)
    sc.add_sphere((-0.45, -1.15, -2.7), 0.85, material=glass)
    sc.add_sphere((1.55, -1.0, -3.4), 1.0, material=silver)

    camera = Camera(position=(0.0, 0.2, 5.0))
    return sc, camera, _options()


def showcase_spheres() -> tuple:
    """readme/spheres.png: pastel red/green corner walls on a blue-grey
    floor, lit by the skybox; a large pale diffuse sphere, a glass sphere,
    a blue metallic sphere mirroring the clouds, and a small emissive red
    sphere."""
    sc = Scene()
    sc.skybox = load_reference_skybox()
    floor = sc.add_material(Material(color=(0.55, 0.65, 0.85)), "Floor")
    pinkw = sc.add_material(Material(color=(0.92, 0.55, 0.55)), "PinkWall")
    greenw = sc.add_material(Material(color=(0.6, 0.92, 0.55)), "GreenWall")
    pale = sc.add_material(Material(color=(0.75, 0.85, 0.95)), "Pale")
    glass = sc.add_material(
        Material(color=(1, 1, 1), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    bluemetal = sc.add_material(
        Material(color=(0.15, 0.25, 0.85), smoothness=0.97, metallic=1.0),
        "BlueMetal")
    redglow = sc.add_material(
        Material(color=(1.0, 0.3, 0.3), emission=(1.0, 0.25, 0.2),
                 emission_strength=3.0), "RedGlow")

    sc.add_plane((0, -1, 0), (0, 1, 0), material=floor)
    # two vertical walls meeting in a corner behind the spheres
    sc.add_plane((0, 0, -9), (0.45, 0, 1), material=pinkw)
    sc.add_plane((8, 0, 0), (-1, 0, 0.35), material=greenw)

    sc.add_sphere((-2.7, 0.4, -4.6), 1.7, material=pale)
    sc.add_sphere((0.3, 1.0, -4.9), 1.1, material=glass)
    sc.add_sphere((2.4, 0.45, -5.1), 1.35, material=bluemetal)
    sc.add_sphere((0.55, -0.6, -3.6), 0.42, material=redglow)

    camera = Camera(position=(0.0, 0.9, 0.0))
    return sc, camera, _options()


def showcase_model(mesh_path: Optional[str] = None,
                   subdivisions: int = 3) -> tuple:
    """readme/model.png: a clear specular mesh looking at a green
    refractive mesh on a blue-grey floor under the cloud skybox.  Suzanne
    in the reference; the procedural organic sculpt (meshgen.organic_blob)
    stands in unless mesh_path points at an STL/OBJ."""
    sc = Scene()
    sc.skybox = load_reference_skybox()
    floor = sc.add_material(Material(color=(0.5, 0.62, 0.8)), "Floor")
    clear = sc.add_material(
        Material(color=(0.95, 0.97, 1.0), smoothness=1.0, specular=0.85),
        "Clear")
    greenglass = sc.add_material(
        Material(color=(0.45, 0.95, 0.5), smoothness=1.0,
                 transmittance=1.0, refraction_index=1.45), "GreenGlass")

    if mesh_path is not None:
        from ..io.obj import load_obj_model
        from ..io.stl import load_stl_model
        loader = (load_stl_model if str(mesh_path).lower().endswith(".stl")
                  else load_obj_model)
        span = loader(mesh_path, sc.pool)
        if span is None:
            raise FileNotFoundError(mesh_path)
    else:
        pos, nrm = organic_blob(subdivisions=subdivisions)
        span = sc.pool.append(pos, nrm)

    sc.add_plane((0, -1.1, 0), (0, 1, 0), material=floor)
    sc.add_model(span, material=clear,
                 transform=transform_trs((-1.3, 0, -3.4), (0.5, 0, 0)))
    sc.add_model(span, material=greenglass,
                 transform=transform_trs((1.3, 0, -3.4), (-0.4, 0, 0)))

    camera = Camera(position=(0.0, 0.4, 0.6))
    return sc, camera, _options()


SHOWCASES = {
    "red_green": showcase_red_green,
    "spheres": showcase_spheres,
    "model": showcase_model,
}
