"""A/B the MT ray sub-block width (_SUB) on config 6 (82K tris).

_SUB=128 is the finest static lane-slice granularity; wider sub-blocks
halve (256) or quarter (512) the per-visited-cluster sub-word slabs and
pl.when branches — the kernel's measured scalar-sync floor — at the
price of coarser MT gating (more wasted MT lanes per hit sub-block).
Result-identical either way: the sub-word gate is conservative at any
width.

MEASURED (v5e, 1080p/4 bounces, iters=6): 128 -> 62.6 Mrays/s,
256 -> 60.6, 512 -> 56.1.  The finest width WINS: the extra MT lanes a
coarser gate lets through cost more than the scalar branches it saves,
so _SUB stays 128.

Usage: python scripts/bench_subwidth.py [iters]   (run on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(label, sub):
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import CONFIGS
    bk._SUB = sub          # module global, read at kernel trace time
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
    run("sub=128", 128)
    run("sub=256", 256)
    run("sub=512", 512)
