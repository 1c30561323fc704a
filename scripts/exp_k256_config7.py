"""Experiment: cluster size K=256 for config 7's 1.31M-tri mesh.

Config 6 (82K tris, VMEM-packed) measured K=256 at 55 vs K=128's 62
Mrays/s — but config 7's HBM-streamed secondary bounces spend 40 of
~110 ms on per-visit overhead (re-slab word + list/loop skeleton +
DMA issue, scripts/profile_compact7.py) that scales with LIST LENGTH,
not triangles: halving the cluster count halves that overhead while
the sub-block MT gate still prunes at 128-ray granularity.  Measures
the compacted bounce-1 kernel on the real ray distribution for K=128
(current) vs K=256 (and the per-K visit sums that explain it).

Usage: python scripts/exp_k256_config7.py [iters]   (on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.pallas import bvh_kernel as bk
from simple_raytracer_tpu.ops.vec import Vec3
from profile_compact7 import bounce1_rays, chain_time

BLOCK_R = 1536


def main():
    scene, camera, _ = CONFIGS[7]()
    ds = scene.build()
    o, d, alive, t_seed = bounce1_rays(ds, camera)
    n_rays = o.x.shape[0]
    cap = bk.compact_cap_auto(n_rays)
    print(f"rays {n_rays:,} cap {cap:,}", flush=True)

    for k in (128, 256):
        scene.cluster_size = k
        scene._cluster_topo = None
        t0 = time.time()
        dsk = scene.build()
        cl = dsk.triangles.clusters
        packets = cl.table_tr.shape[1] // bk._TROWS if cl.table_tr is not None else 0
        print(f"K={k}: clusters {cl.aabb.shape[0]:,} packets/cluster "
              f"{packets} build {time.time()-t0:.0f}s", flush=True)

        pre = jax.jit(lambda *a, cl=cl: bk._visit_prepass(
            *a, cl.aabb, BLOCK_R, (-cap) % BLOCK_R)[1])
        prefix, count = jax.jit(lambda *a, cl=cl: bk._compact_prefix(
            *a, cl.aabb, cap, "super"))(o, d, alive, t_seed)
        g = lambda v: jnp.take(v, prefix, axis=0)
        oc, dc = Vec3(g(o.x), g(o.y), g(o.z)), Vec3(g(d.x), g(d.y), g(d.z))
        ac, tc = g(alive), g(t_seed)
        c = np.asarray(pre(oc, dc, ac, tc))
        print(f"  admitted {int(count):,} list-visits sum {c.sum():,} "
              f"(mean/block {c.mean():.0f})", flush=True)

        kern = jax.jit(lambda o, d, al, ti, cl=cl: bk.intersect_triangles_bvh(
            o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
            table_tr=cl.table_tr))
        dt = chain_time(kern, oc, dc, ac, tc)
        print(f"  kernel[K={k}]  {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
