from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config4_mesh_glass
W, H = 1920, 1080
for backend, tile in [("jnp", None), ("clustered", (8, 64))]:
    scene, cam, _ = config4_mesh_glass()
    opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4,
                         tri_backend=backend, ray_tile=tile)
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(cam, iters=5, warmup=2)
    print(f"{backend:10s} {st['seconds_per_step']*1e3:8.1f} ms/step "
          f"{st['mrays_per_second']:6.1f} Mrays/s", flush=True)
