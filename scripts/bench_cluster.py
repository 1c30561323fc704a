import sys, time
import jax, jax.numpy as jnp, numpy as np
from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config4_mesh_glass, config5_two_meshes

W, H = 1920, 1080
sub = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for backend in ["jnp", "clustered"]:
    scene, camera, _ = config4_mesh_glass()
    if sub != 3:
        # bigger mesh
        from simple_raytracer_tpu.models.meshgen import icosphere
        from simple_raytracer_tpu.models.shapes import transform_trs
        from simple_raytracer_tpu.models import Scene
        from simple_raytracer_tpu.models.materials import Material
        scene = Scene()
        scene.add_plane((0,-1.2,0),(0,1,0))
        g = scene.add_material(Material(color=(0.9,0.95,1.0), smoothness=1.0, transmittance=1.0, refraction_index=1.5))
        pos, nrm = icosphere(subdivisions=sub)
        span = scene.pool.append(pos, nrm)
        scene.add_model(span, material=g, transform=transform_trs((0,0,-2.5)))
    ntris = len(scene.pool)
    opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4, tri_backend=backend)
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(camera, iters=5, warmup=2)
    print(f"{backend:10s} tris={ntris} {st['seconds_per_step']*1e3:8.1f} ms/step  {st['mrays_per_second']:6.1f} Mrays/s")
