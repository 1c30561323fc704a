"""Sweep config 6 (82K-tri HBM BVH path) step time over the knobs that
trade culling granularity against per-cluster overhead:

  cluster_size K in {64, 128}  (K=128 halves the serial visit chain and
                                fills every MT lane of the packed tile;
                                K=64 culls twice as fine)
  packed (table_tr) on/off     (96 vs 512 B/triangle of DMA)

Usage: python scripts/sweep_config6.py [iters]
Prints one line per variant; run on the TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS
import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(k, packed):
    scene, camera, _ = CONFIGS[6]()
    scene.cluster_size = k
    orig = bk.intersect_triangles_bvh
    if not packed:
        def unpacked(*a, **kw):
            kw["table_tr"] = None   # caller kwargs would win over partial
            return orig(*a, **kw)
        bk.intersect_triangles_bvh = unpacked
    try:
        opts = RenderOptions(width=1920, height=1080, num_samples=1,
                             num_bounces=4)
        r = Renderer(opts, scene=scene)
        st = r.benchmark_step(camera, iters=ITERS, warmup=2)
    finally:
        bk.intersect_triangles_bvh = orig
    print(f"K={k:3d} packed={int(packed)}  "
          f"{st['seconds_per_step']*1e3:8.2f} ms  "
          f"{st['mrays_per_second']:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    for k in (64, 128):
        for packed in (True, False):
            run(k, packed)
