import time, sys
import jax, jax.numpy as jnp
from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config4_mesh_glass

W, H = 1920, 1080
scene, camera, _ = config4_mesh_glass()
ntris = len(scene.pool)
opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4,
                     tri_chunk=int(sys.argv[1]) if len(sys.argv) > 1 else 256)
r = Renderer(opts, scene=scene)
st = r.benchmark_step(camera, iters=5, warmup=2)
print(f"tris={ntris} chunk={opts.tri_chunk} "
      f"{st['seconds_per_step']*1e3:.1f} ms/step, "
      f"{st['mrays_per_second']:.1f} Mrays/s")
