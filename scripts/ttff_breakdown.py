"""Decompose warm time-to-first-frame: trace vs lower vs compile vs run.

ttff.py measures the user contract (process start -> first frame);
this script opens the box on its dominant term, compile_and_step_s,
by timing each jit stage of the default-options step separately:

  trace_s    jax tracing to jaxpr (pure Python — the persistent cache
             cannot help here)
  lower_s    jaxpr -> StableHLO
  compile_s  XLA compile, or persistent-cache DESERIALIZATION on a
             warm machine (the only stage the cache accelerates)
  step_s     one real device step + image fetch

Run on the TPU: python scripts/ttff_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.trace import make_render_step


def main():
    scene, camera, _ = CONFIGS[2]()
    t0 = time.perf_counter()
    r = Renderer(RenderOptions(), scene=scene)   # reference defaults
    t_build = time.perf_counter()
    print(f"renderer_build_s {t_build - t0:.2f}", flush=True)

    o = r.options
    fn = make_render_step(o.width, o.height, o.num_samples, o.num_bounces,
                          show_normals=o.show_normals, tri_chunk=o.tri_chunk,
                          tri_backend=o.tri_backend, ray_tile=r._tile,
                          canvas_tiled=r._tile is not None)
    cam = camera.state(o.width / o.height)
    import jax.numpy as jnp
    args = (r.device_scene, cam, r._canvas, jnp.uint32(1))

    t1 = time.perf_counter()
    if hasattr(fn, "trace"):
        traced = fn.trace(*args)
        t2 = time.perf_counter()
        print(f"trace_s {t2 - t1:.2f}", flush=True)
        lowered = traced.lower()
    else:
        t2 = t1
        lowered = fn.lower(*args)
    t3 = time.perf_counter()
    print(f"lower_s {t3 - t2:.2f}", flush=True)
    compiled = lowered.compile()
    t4 = time.perf_counter()
    print(f"compile_s {t4 - t3:.2f}  (cache hit when warm)", flush=True)

    # step through the AOT-compiled executable: r.step() would dispatch
    # through the jit cache, which the AOT trace/lower/compile above did
    # NOT populate, so it would re-lower and re-compile (hitting the
    # persistent cache) and double-count those stages in this stage.
    import jax
    canvas = jax.block_until_ready(compiled(*args))
    r._canvas = canvas
    r.num_steps = 1
    img = r.image()
    t5 = time.perf_counter()
    print(f"step_and_image_s {t5 - t4:.2f}", flush=True)
    print(f"total_s {t5 - t0:.2f}", flush=True)


if __name__ == "__main__":
    main()
