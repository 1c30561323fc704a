"""A/B the compact-then-trace BVH path on config 6 (82K-tri mesh).

Rows: SRT_BVH_COMPACT=0 (round-3 dense behavior), auto (1/16 cap),
and a few explicit caps around it.  Each row re-clears the kernel's
jit cache so the trace-time env knob actually applies.

Usage: python scripts/bench_compact.py [iters] [rows] [config]
(on the TPU; rows comma-separated from {unset, 0, auto, <cap>, cap:<n>})
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(label, knob, config=6):
    os.environ.pop("SRT_BVH_COMPACT", None)
    os.environ.pop("SRT_BVH_COMPACT_CAP", None)
    if knob.startswith("cap:"):  # peeled policy with an explicit cap
        os.environ["SRT_BVH_COMPACT_CAP"] = knob[4:]
    elif knob != "unset":        # "unset" = default: bounce-0 peel + auto
        os.environ["SRT_BVH_COMPACT"] = knob
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    bk.intersect_triangles_bvh.clear_cache() if hasattr(
        bk.intersect_triangles_bvh, "clear_cache") else None
    scene, camera, _ = CONFIGS[config]()
    opts = RenderOptions(width=1920, height=1080, num_samples=1,
                         num_bounces=4)
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(camera, iters=ITERS, warmup=2)
    print(f"config{config} {label:22s} {st['seconds_per_step']*1e3:8.2f} ms  "
          f"{st['mrays_per_second']:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    rows = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "unset", "0", "auto"]
    cfg = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    for knob in rows:
        run(f"compact={knob}", knob, config=cfg)
