"""Micro-profile of exp_refine_sort's 21 ms refinement: which piece
dominates — the 104K-ray gather, the (688, 104K) fine slab, the 104K
key sort, or the final prefix permute?  Decides whether a fused
in-wrapper refinement stage can be cheap enough to net the ~23 ms
kernel saving it buys on config 7's bounce-1 rays.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.pallas import bvh_kernel as bk
from profile_compact7 import bounce1_rays, chain_time
from exp_refine_sort import _pad_clusters, take_rays

def main():
    scene, camera, _ = CONFIGS[7]()
    ds = scene.build()
    cl = ds.triangles.clusters
    o, d, alive, t_seed = bounce1_rays(ds, camera)
    cap = bk.compact_cap_auto(o.x.shape[0])
    prefix, _ = jax.jit(lambda *a: bk._compact_prefix(
        *a, cl.aabb, cap, "super"))(o, d, alive, t_seed)
    boxes = bk._union_boxes8(_pad_clusters(cl.aabb).reshape(-1, bk._SUPER, 8))
    n_super = boxes.shape[0]

    # (a) gather rays at prefix (8 lanes)
    ga = jax.jit(lambda p: take_rays(o, d, alive, t_seed, p))
    dt = chain_time(ga, prefix)
    print(f"gather 8x{cap}: {dt*1e3:7.2f} ms", flush=True)
    oc, dc, ac, tc = jax.block_until_ready(ga(prefix))

    # (b) fine slab + first-admitted rank
    def fine_first(oc_x, oc_y, oc_z, dc_x, dc_y, dc_z, ac, tc):
        ox, oy, oz = oc_x[None], oc_y[None], oc_z[None]
        inx, iny, inz = 1.0 / dc_x[None], 1.0 / dc_y[None], 1.0 / dc_z[None]
        live = (ac > 0.0)[None]
        col = lambda j: boxes[:, j][:, None]
        t1x = (col(0) - ox) * inx
        t2x = (col(3) - ox) * inx
        t1y = (col(1) - oy) * iny
        t2y = (col(4) - oy) * iny
        t1z = (col(2) - oz) * inz
        t2z = (col(5) - oz) * inz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.minimum(jnp.maximum(t1z, t2z), tc[None]))
        maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live
        iota = jax.lax.broadcasted_iota(jnp.int32, maybe.shape, 0)
        return jnp.min(jnp.where(maybe, iota, n_super), axis=0)
    fs = jax.jit(fine_first)
    dt = chain_time(fs, oc.x, oc.y, oc.z, dc.x, dc.y, dc.z, ac, tc)
    print(f"fine slab ({n_super}x{cap}): {dt*1e3:7.2f} ms", flush=True)
    first = jax.block_until_ready(fs(oc.x, oc.y, oc.z, dc.x, dc.y, dc.z,
                                     ac, tc))

    # (c) 104K packed-key sort + (d) prefix permute
    def resort(first, prefix):
        idx_bits = max((cap - 1).bit_length(), 1)
        key = (first << idx_bits) | jnp.arange(cap, dtype=jnp.int32)
        (skey,) = jax.lax.sort((key,))
        return jnp.take(prefix, skey & ((1 << idx_bits) - 1), axis=0)
    rs = jax.jit(resort)
    dt = chain_time(rs, first, prefix)
    print(f"sort+permute {cap}: {dt*1e3:7.2f} ms", flush=True)

    # (e) all fused in one jit
    def fused(p):
        oc, dc, ac, tc = take_rays(o, d, alive, t_seed, p)
        f = fine_first(oc.x, oc.y, oc.z, dc.x, dc.y, dc.z, ac, tc)
        return resort(f, p)
    fu = jax.jit(fused)
    dt = chain_time(fu, prefix)
    print(f"fused total: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
