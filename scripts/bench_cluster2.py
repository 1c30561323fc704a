import sys, time
import jax, jax.numpy as jnp, numpy as np
from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.models.shapes import transform_trs
from simple_raytracer_tpu.models import Scene, Camera
from simple_raytracer_tpu.models.materials import Material

W, H = 1920, 1080
sub = int(sys.argv[1]) if len(sys.argv) > 1 else 4
cases = [("jnp", None), ("clustered", None), ("clustered", (8, 64)), ("jnp", (8, 64))]
for backend, tile in cases:
    scene = Scene()
    scene.add_plane((0,-1.2,0),(0,1,0))
    g = scene.add_material(Material(color=(0.9,0.95,1.0), smoothness=1.0,
                                    transmittance=1.0, refraction_index=1.5))
    pos, nrm = icosphere(subdivisions=sub)
    span = scene.pool.append(pos, nrm)
    scene.add_model(span, material=g, transform=transform_trs((0,0,-2.5)))
    ntris = len(scene.pool)
    opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4,
                         tri_backend=backend, ray_tile=tile)
    cam = Camera(position=(0.0, 0.3, 2.5))
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(cam, iters=5, warmup=2)
    print(f"{backend:10s} tile={str(tile):9s} tris={ntris} "
          f"{st['seconds_per_step']*1e3:8.1f} ms/step  {st['mrays_per_second']:6.1f} Mrays/s", flush=True)
