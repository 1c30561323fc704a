"""Sweep config 6 (82K-tri mesh) step time across the large-mesh paths:

  mega        K=128 packed table VMEM-resident, whole-trace megakernel
              (the default route after the round-3 packed-table work)
  split K=128 per-bounce split path (XLA prepass + HBM BVH kernel +
              bounce kernel), packed streaming tiles
  split K=64  same, finer culling granularity
  split-row   K=64 with the packed table disabled (512 B/tri row DMA —
              the round-2 form, kept as the regression baseline)

Usage: python scripts/sweep_config6.py [iters]   (run on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS
import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(label, k, backend, strip_packed=False, prepass="super",
        mt_slices=1, subbox="0", block_r=None):
    import simple_raytracer_tpu.ops.pallas.bounce_kernel as bok
    bok.MEGA_MT_SLICES = mt_slices
    os.environ["SRT_BVH_SUBBOX"] = subbox
    # the kernel fn is itself jitted and reads env knobs at ITS trace
    # time; drop its cached traces so per-row knobs actually apply
    bk.intersect_triangles_bvh.clear_cache()
    scene, camera, _ = CONFIGS[6]()
    scene.cluster_size = k
    orig = bk.intersect_triangles_bvh

    def shim(*a, **kw):
        if strip_packed:
            kw["table_tr"] = None
        kw["prepass_level"] = prepass
        if block_r is not None:
            kw["block_r"] = block_r
        return orig(*a, **kw)

    bk.intersect_triangles_bvh = shim
    try:
        opts = RenderOptions(width=1920, height=1080, num_samples=1,
                             num_bounces=4, tri_backend=backend)
        r = Renderer(opts, scene=scene)
        st = r.benchmark_step(camera, iters=ITERS, warmup=2)
    finally:
        bk.intersect_triangles_bvh = orig
    print(f"{label:18s} {st['seconds_per_step']*1e3:8.2f} ms  "
          f"{st['mrays_per_second']:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    # "fused" forces the megakernel at this scale (auto now routes 82K
    # tris to the measured-faster split path)
    run("split K=128 2lv", None, "bvh", prepass="group")
    os.environ["SRT_BVH_NO_MT"] = "1"
    run("NO_MT (floor)", None, "bvh", prepass="group")
    os.environ["SRT_BVH_NO_SUBWORD"] = "1"
    run("NO_MT NO_SUBW", None, "bvh", prepass="group")
    del os.environ["SRT_BVH_NO_MT"]
    run("NO_SUBWORD", None, "bvh", prepass="group")
    del os.environ["SRT_BVH_NO_SUBWORD"]
    os.environ["SRT_BVH_ORDER"] = "rev"
    run("REV order", None, "bvh", prepass="group")
    del os.environ["SRT_BVH_ORDER"]
