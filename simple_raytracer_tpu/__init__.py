"""simple_raytracer_tpu — a TPU-native progressive path-tracing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++/OpenCL
reference (davawen/Simple-Raytracer): sphere/plane/box/triangle-mesh
primitives, a unified diffuse/metallic/specular/refractive/emissive material
model, equirect skybox + analytic sun environment lighting, STL/OBJ mesh
loading, progressive accumulation with ACES tonemapping, and multi-chip SPMD
rendering over a `jax.sharding.Mesh`.
"""

from .models.camera import Camera
from .models.materials import Material, MaterialSet, from_hex, from_rgb
from .models.scene import Scene, SkySettings
from .engine import Renderer, RenderOptions

__version__ = "0.1.0"

__all__ = [
    "Camera", "Material", "MaterialSet", "Scene", "SkySettings",
    "Renderer", "RenderOptions", "from_hex", "from_rgb",
]
