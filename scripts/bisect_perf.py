from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config2_four_spheres
import numpy as np

W, H = 1920, 1080
for tile, use_skybox in [(None, False), ("auto", False), (None, True), ("auto", True)]:
    scene, cam, _ = config2_four_spheres()
    if use_skybox:
        from simple_raytracer_tpu.ops.sky import procedural_skybox
        sb = procedural_skybox()
        scene.skybox = np.stack([np.asarray(sb.x), np.asarray(sb.y),
                                 np.asarray(sb.z)], axis=-1)
    opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4,
                         ray_tile=tile)
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(cam, iters=8, warmup=2)
    print(f"tile={str(tile):6s} skybox={use_skybox} "
          f"{st['seconds_per_step']*1e3:7.1f} ms  {st['mrays_per_second']:6.1f} Mrays/s", flush=True)
