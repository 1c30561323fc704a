"""simple_raytracer_tpu — a TPU-native progressive path-tracing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++/OpenCL
reference (davawen/Simple-Raytracer): sphere/plane/box/triangle-mesh
primitives, a unified diffuse/metallic/specular/refractive/emissive material
model, equirect skybox + analytic sun environment lighting, STL/OBJ mesh
loading, progressive accumulation with ACES tonemapping, and multi-chip SPMD
rendering over a `jax.sharding.Mesh`.
"""

import os as _os

import jax as _jax


def _enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    The whole-trace megakernel costs minutes of XLA+Mosaic compile per
    static (W, H, S, B, scene-shape) config — the analog of the
    reference's one-time OpenCL program build (tracer.cpp:21-26), except
    OpenCL rebuilds per process while this cache makes it per MACHINE:
    every later process (CLI render, viewer session, test run) deserializes
    the compiled step in seconds.  Opt out with SRT_NO_COMPILE_CACHE=1;
    an explicit user/env configuration (JAX_COMPILATION_CACHE_DIR) wins."""
    if _os.environ.get("SRT_NO_COMPILE_CACHE"):
        return
    try:
        if _jax.config.jax_compilation_cache_dir:
            return  # already configured (env var or host app)
        cache = _os.path.join(
            _os.environ.get("XDG_CACHE_HOME")
            or _os.path.join(_os.path.expanduser("~"), ".cache"),
            "simple_raytracer_tpu", "jax_cache")
        _jax.config.update("jax_compilation_cache_dir", cache)
        # cache every compile that took >1s (the default 2-arg AND of
        # size+time thresholds skips small-but-slow Mosaic kernels)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()

from .models.camera import Camera
from .models.materials import Material, MaterialSet, from_hex, from_rgb
from .models.scene import Scene, SkySettings
from .engine import Renderer, RenderOptions

__version__ = "0.1.0"

__all__ = [
    "Camera", "Material", "MaterialSet", "Scene", "SkySettings",
    "Renderer", "RenderOptions", "from_hex", "from_rgb",
]
