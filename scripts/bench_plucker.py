"""A/B the Moller-Trumbore evaluation form on config 6 (82K tris):

  mt       (K, 1) x (1, 128) VPU broadcast form (the round-3 default)
  plucker  MXU bilinear form — one (10, 6K) x (10, 128) dot_general per
           (visited cluster, hit sub-block) yields [u*a, v*a, a, t*a,
           act, gidx] planes; the VPU epilogue shrinks from ~55 to ~18
           ops per lane pair (ops/pallas/bvh_kernel.py::_mt_update_sub_mxu)

Usage: python scripts/bench_plucker.py [iters]   (run on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(label, form):
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import CONFIGS
    os.environ["SRT_BVH_MT"] = form
    # the env knob is read at the kernel fn's trace time — drop caches
    bk.intersect_triangles_bvh.clear_cache()
    scene, camera, _ = CONFIGS[6]()
    opts = RenderOptions(width=1920, height=1080, num_samples=1,
                         num_bounces=4, tri_backend="bvh")
    r = Renderer(opts, scene=scene)
    st = r.benchmark_step(camera, iters=ITERS, warmup=2)
    print(f"{label:10s} {st['seconds_per_step']*1e3:8.2f} ms  "
          f"{st['mrays_per_second']:7.1f} Mrays/s", flush=True)
    return st


if __name__ == "__main__":
    run("mt", "mt")
    run("plucker", "plucker")
    run("mt(again)", "mt")
