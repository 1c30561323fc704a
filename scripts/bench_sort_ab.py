"""A/B the per-bounce ray coherence sort on the HBM BVH path (config 6).

Runs the bench-shape config-6 step (1920x1080, 1 spp, 4 bounces) twice on
the current device: once with the sort explicitly enabled and once with
the production default (sort OFF — measured 13x slower when on, see
bvh_kernel._sort_rays_by_super), forcing tri_backend="bvh" so both legs
actually exercise intersect_triangles_bvh.  Uses engine.benchmark_step's
chained-iteration methodology.  One-off diagnostic; keep for regression
hunts.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS


def run(label, sort):
    # Force the split BVH path (tri_backend="bvh"): config 6's packed
    # table fits the megakernel's VMEM budget, so the default "auto"
    # route never calls intersect_triangles_bvh and both legs would
    # measure identical code.  The sort is off by default, so the
    # sorted leg must request it explicitly.
    orig = bk.intersect_triangles_bvh
    bk.intersect_triangles_bvh = functools.partial(orig, sort_rays=sort)
    try:
        scene, camera, _ = CONFIGS[6]()
        opts = RenderOptions(width=1920, height=1080, num_samples=1,
                             num_bounces=4, tri_backend="bvh")
        r = Renderer(opts, scene=scene)
        stats = r.benchmark_step(camera, iters=8, warmup=2)
    finally:
        bk.intersect_triangles_bvh = orig
    out = {"label": label,
           "mrays_per_second": round(stats["mrays_per_second"], 2),
           "seconds_per_step": round(stats["seconds_per_step"], 5)}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    run("sorted", sort=True)
    run("unsorted", sort=False)
