"""The five BASELINE.json benchmark/parity scene configurations.

Each builder returns ``(scene, camera, options)``.  Scenes follow the
reference's showcase setups (README.md:5-11) and defaults (main.cpp:98-126);
mesh configs accept a user STL/OBJ path (Suzanne in the reference's
showcase) and fall back to a procedural icosphere so they run out of the
box.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..engine import RenderOptions
from ..io.obj import load_obj_model
from ..io.stl import load_stl_model
from .camera import Camera
from .materials import Material
from .meshgen import organic_blob
from .scene import Scene
from .shapes import transform_trs


def _cornell_base(scene: Scene) -> None:
    """Red/green wall box out of planes, white floor/ceiling/back."""
    white = 0  # default Material0
    red = scene.add_material(Material(color=(0.9, 0.1, 0.1)), "Red")
    green = scene.add_material(Material(color=(0.1, 0.9, 0.1)), "Green")
    scene.add_plane((0, -2, 0), (0, 1, 0), material=white)     # floor
    scene.add_plane((0, 4, 0), (0, -1, 0), material=white)     # ceiling
    scene.add_plane((0, 0, -6), (0, 0, 1), material=white)     # back
    scene.add_plane((-4, 0, 0), (1, 0, 0), material=red)       # left
    scene.add_plane((4, 0, 0), (-1, 0, 0), material=green)     # right


def config1_red_green(width: int = 512, height: int = 512) -> tuple:
    """Red/green walls + one diffuse sphere, direct lighting."""
    scene = Scene()
    _cornell_base(scene)
    # the five infinite planes enclose every ray direction (only the
    # measure-zero exact +z axis escapes): declare the sky unreachable so
    # the megakernel skips its per-block early-exit check (result-neutral
    # perf hint, ops.scene_types.SceneFlags)
    scene.sky_reachable = False
    scene.add_sphere((0, -1, -2), 1.0, material=0)
    light = scene.add_material(
        Material(emission=(1, 1, 1), emission_strength=4.0), "Light")
    scene.add_sphere((0, 3.0, -2), 1.0, material=light)
    camera = Camera(position=(0.0, 0.0, 5.0))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=2)
    return scene, camera, options


def config2_four_spheres(width: int = 960, height: int = 540) -> tuple:
    """Metallic / specular / refractive / emissive spheres, 4-bounce."""
    scene = Scene()
    scene.add_plane((0, -1, 0), (0, 1, 0), material=0)  # ground
    metal = scene.add_material(
        Material(color=(0.9, 0.6, 0.2), smoothness=0.9, metallic=1.0), "Metal")
    mirror = scene.add_material(
        Material(color=(1, 1, 1), smoothness=1.0, specular=1.0), "Mirror")
    glass = scene.add_material(
        Material(color=(1, 1, 1), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    lamp = scene.add_material(
        Material(emission=(1.0, 0.9, 0.7), emission_strength=8.0), "Lamp")
    scene.add_sphere((-3.1, 0, -2), 1.0, material=metal)
    scene.add_sphere((-1.05, 0, -2), 1.0, material=mirror)
    scene.add_sphere((1.05, 0, -2), 1.0, material=glass)
    scene.add_sphere((3.1, 0, -2), 1.0, material=lamp)
    camera = Camera(position=(0.0, 0.5, 5.0))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=4)
    return scene, camera, options


def config3_skybox_emissive(width: int = 960, height: int = 540,
                            skybox="auto") -> tuple:
    """Skybox environment lighting + emissive area lights, 8-bounce.

    BASELINE.json specifies "skybox environment lighting
    (assets/skybox.png)": with skybox="auto", when the reference
    checkout is present its 2048x1024 skybox texture is loaded (the
    reference always samples it, tracer.cpp:42-52); otherwise the
    analytic gradient sky stands in so the preset works anywhere.
    skybox="gradient" (or None) pins the gradient sky regardless of the
    environment — the deterministic form the golden tests use — and an
    (H, W, 3) array supplies an explicit texture."""
    scene = Scene()
    if isinstance(skybox, str):
        if skybox == "auto":
            from .showcase import load_reference_skybox
            skybox = load_reference_skybox()
        elif skybox == "gradient":
            skybox = None
        else:
            raise ValueError(f"unknown skybox mode {skybox!r}")
    if skybox is not None:
        scene.skybox = skybox
    scene.add_plane((0, -1, 0), (0, 1, 0), material=0)
    area = scene.add_material(
        Material(color=(1, 1, 1), emission=(1.0, 0.95, 0.8),
                 emission_strength=12.0), "Area")
    glossy = scene.add_material(
        Material(color=(0.3, 0.4, 0.9), smoothness=0.7, metallic=0.4),
        "Glossy")
    scene.add_box((0, 2.8, -3), size=(3.0, 0.2, 3.0), material=area)
    scene.add_sphere((0, 0, -3), 1.0, material=glossy)
    scene.add_sphere((-2.4, -0.4, -2.2), 0.6, material=0)
    camera = Camera(position=(0.0, 0.5, 3.0))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=8)
    return scene, camera, options


def _add_mesh(scene: Scene, path: Optional[str], subdivisions: int = 3):
    if path is not None:
        p = str(path)
        if p.lower().endswith(".stl"):
            span = load_stl_model(p, scene.pool)
        else:
            span = load_obj_model(p, scene.pool)
        if span is None:
            raise FileNotFoundError(p)
        return span
    # Suzanne-fidelity stand-in: non-convex organic sculpt, 1280 tris at
    # subdiv 3 (Blender's Suzanne is ~1.4K triangulated) — see meshgen
    pos, nrm = organic_blob(subdivisions=subdivisions)
    return scene.pool.append(pos, nrm)


def config4_mesh_glass(width: int = 960, height: int = 540,
                       mesh_path: Optional[str] = None) -> tuple:
    """Triangulated mesh (Suzanne .obj/.stl, or a procedural icosphere),
    brute-force triangle intersection, glass material."""
    scene = Scene()
    scene.add_plane((0, -1.2, 0), (0, 1, 0), material=0)
    glass = scene.add_material(
        Material(color=(0.9, 0.95, 1.0), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    span = _add_mesh(scene, mesh_path)
    scene.add_model(span, material=glass,
                    transform=transform_trs((0, 0, -2.5)))
    camera = Camera(position=(0.0, 0.3, 2.5))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=6)
    return scene, camera, options


def config5_two_meshes(width: int = 960, height: int = 540,
                       mesh_path: Optional[str] = None) -> tuple:
    """Two mesh instances (refractive + metallic) — the BVH stretch config."""
    scene = Scene()
    scene.add_plane((0, -1.2, 0), (0, 1, 0), material=0)
    glass = scene.add_material(
        Material(color=(0.9, 0.95, 1.0), smoothness=1.0, transmittance=1.0,
                 refraction_index=1.5), "Glass")
    metal = scene.add_material(
        Material(color=(0.9, 0.7, 0.3), smoothness=0.85, metallic=1.0),
        "Metal")
    span = _add_mesh(scene, mesh_path)
    scene.add_model(span, material=glass,
                    transform=transform_trs((-1.4, 0, -2.8),
                                            (math.pi / 8, 0, 0)))
    scene.add_model(span, material=metal,
                    transform=transform_trs((1.4, 0, -2.8),
                                            (-math.pi / 8, 0, 0)))
    camera = Camera(position=(0.0, 0.3, 2.5))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=6)
    return scene, camera, options


def config6_large_mesh(width: int = 960, height: int = 540,
                       mesh_path: Optional[str] = None,
                       subdivisions: int = 6) -> tuple:
    """Large-mesh stress config: one ~82K-triangle organic sculpt on a
    ground plane (table far beyond VMEM residence — exercises the
    HBM/DMA streaming BVH path that big production assets take).  The
    reference brute-forces every triangle per ray (render.cl:316-331);
    this config is the scale where that architecture collapses and a
    hierarchy is mandatory."""
    scene = Scene()
    scene.add_plane((0, -1.2, 0), (0, 1, 0), material=0)
    m = scene.add_material(
        Material(color=(0.8, 0.7, 0.6), smoothness=0.3), "Clay")
    span = _add_mesh(scene, mesh_path, subdivisions=subdivisions)
    scene.add_model(span, material=m,
                    transform=transform_trs((0, 0, -2.5)))
    camera = Camera(position=(0.0, 0.3, 2.5))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=6)
    return scene, camera, options


def config7_mega_mesh(width: int = 960, height: int = 540,
                      mesh_path: Optional[str] = None,
                      subdivisions: int = 8) -> tuple:
    """Production-asset stress config: one ~1.31M-triangle organic sculpt
    (subdiv-8 icosphere displacement) on a ground plane.  The packed
    table (96 B/tri) is ~16x past the packed-VMEM residence budget, so
    this is the scale that exercises the HBM streaming kernel
    (bvh_kernel._kernel_hbm: double-buffered per-visit DMA over an
    in-kernel compacted visit list) — the path big production assets
    take.  The reference architecture (per-ray brute force over every
    triangle, render.cl:316-331) is ~6 Grays-equivalent of Moller-
    Trumbore per 1080p sample here; a hierarchy is not optional."""
    scene = Scene()
    scene.add_plane((0, -1.2, 0), (0, 1, 0), material=0)
    m = scene.add_material(
        Material(color=(0.8, 0.7, 0.6), smoothness=0.3), "Clay")
    span = _add_mesh(scene, mesh_path, subdivisions=subdivisions)
    scene.add_model(span, material=m,
                    transform=transform_trs((0, 0, -2.5)))
    camera = Camera(position=(0.0, 0.3, 2.5))
    options = RenderOptions(width=width, height=height, num_samples=2,
                            num_bounces=6)
    return scene, camera, options


CONFIGS = {
    1: config1_red_green,
    2: config2_four_spheres,
    3: config3_skybox_emissive,
    4: config4_mesh_glass,
    5: config5_two_meshes,
    6: config6_large_mesh,
    7: config7_mega_mesh,
}
