"""Experiment: does re-sorting the compacted prefix by first-admitted
rank over the UNCOARSENED superclusters shrink the per-block visit
union on config 7's real bounce-1 rays?

The compact wrapper's coherence key ranks rays by their first admitted
COARSENED admission box (_admission_boxes caps the slab matrix at 256
boxes — config 7's 688 supers coarsen to 44, each spanning ~16 supers /
~256 clusters).  Rays sharing a coarse bucket can still start traversal
anywhere inside a ~256-cluster region, so each 1536-ray kernel block
streams a ~1.2K-cluster union from HBM.  A second, cap-sized sort
against the real 688 super boxes is ~1/20 the cost of a full-grid fine
slab and should pack blocks around a single traversal entry point.

Prints cluster-level visit totals (the kernel's SMEM list length — what
re-slab words, DMA issues, and the loop skeleton scale with) and
(cluster x sub-block) admission totals (what MT scales with) for the
coarse-key prefix vs the refined prefix.

Usage: python scripts/exp_refine_sort.py   (on the TPU)
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
from profile_compact7 import bounce1_rays, ITERS, chain_time

W, H = 1920, 1080
BLOCK_R = 1536
SUB = 128


def visit_sums(label, cl, o, d, alive, t_init):
    """Cluster-level visits per 1536-block (list length) and per
    128-sub-block (MT admissions), via the prepass on each granularity."""
    f = jax.jit(lambda *a: (
        bk._visit_prepass(*a, cl.aabb, BLOCK_R, (-o.x.shape[0]) % BLOCK_R)[1],
        bk._visit_prepass(*a, cl.aabb, SUB, (-o.x.shape[0]) % SUB)[1]))
    c_blk, c_sub = f(o, d, alive, t_init)
    c_blk, c_sub = np.asarray(c_blk), np.asarray(c_sub)
    print(f"  {label}: list-visits sum {c_blk.sum():,} "
          f"(mean/block {c_blk.mean():.0f}, p90 "
          f"{np.percentile(c_blk, 90):.0f})   mt-subvisits sum "
          f"{c_sub.sum():,}", flush=True)
    return int(c_blk.sum()), int(c_sub.sum())


def take_rays(o, d, alive, t_init, idx):
    g = lambda v: jnp.take(v, idx, axis=0)
    return (Vec3(g(o.x), g(o.y), g(o.z)), Vec3(g(d.x), g(d.y), g(d.z)),
            g(alive), g(t_init))


def fine_rank_sort(o, d, alive, t_init, aabb, prefix):
    """Re-sort the cap-sized prefix by (first-admitted UNCOARSENED super
    rank, octant), stable.  Returns the re-ordered prefix."""
    oc, dc, ac, tc = take_rays(o, d, alive, t_init, prefix)
    boxes = bk._union_boxes8(_pad_clusters(aabb).reshape(-1, bk._SUPER, 8))
    n_super = boxes.shape[0]
    w = ac
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    origin = jnp.stack([jnp.sum(oc.x * w), jnp.sum(oc.y * w),
                        jnp.sum(oc.z * w)]) / wsum
    centers = (boxes[:, 0:3] + boxes[:, 3:6]) * 0.5
    d2 = jnp.sum((centers - origin[None, :]) ** 2, axis=1)
    rank = jnp.zeros((n_super,), jnp.int32).at[jnp.argsort(d2)].set(
        jnp.arange(n_super, dtype=jnp.int32))

    ox, oy, oz = oc.x[None], oc.y[None], oc.z[None]
    inx, iny, inz = 1.0 / dc.x[None], 1.0 / dc.y[None], 1.0 / dc.z[None]
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
    first = jnp.min(jnp.where(maybe, rank[:, None], n_super), axis=0)
    octant = ((dc.x < 0) * 4 + (dc.y < 0) * 2 + (dc.z < 0)).astype(jnp.int32)
    cap = prefix.shape[0]
    idx_bits = max((cap - 1).bit_length(), 1)
    key = ((first * 8 + octant).astype(jnp.int32) << idx_bits) \
        | jnp.arange(cap, dtype=jnp.int32)
    (skey,) = jax.lax.sort((key,))
    return jnp.take(prefix, skey & ((1 << idx_bits) - 1), axis=0)


def _pad_clusters(aabb):
    n = aabb.shape[0]
    pad = (-n) % bk._SUPER
    if pad:
        sent = jnp.full((pad, 8), 3.0e38, jnp.float32).at[:, 6:].set(0.0)
        aabb = jnp.concatenate([aabb, sent])
    return aabb


def main():
    scene, camera, _ = CONFIGS[7]()
    ds = scene.build()
    cl = ds.triangles.clusters
    o, d, alive, t_seed = bounce1_rays(ds, camera)
    n_rays = o.x.shape[0]
    cap = bk.compact_cap_auto(n_rays)
    print(f"rays {n_rays:,} cap {cap:,} supers "
          f"{_pad_clusters(cl.aabb).shape[0] // bk._SUPER}", flush=True)

    prefix, count = jax.jit(lambda *a: bk._compact_prefix(
        *a, cl.aabb, cap, "super"))(o, d, alive, t_seed)
    print(f"admitted {int(count):,}", flush=True)

    oc = take_rays(o, d, alive, t_seed, prefix)
    visit_sums("coarse-super key (current)", cl, *oc)

    t0 = time.time()
    refined = jax.block_until_ready(jax.jit(fine_rank_sort, static_argnums=())(
        o, d, alive, t_seed, cl.aabb, prefix))
    of = take_rays(o, d, alive, t_seed, refined)
    visit_sums("refined fine-super key", cl, *of)

    # wall cost of the refinement itself (jitted, steady state)
    f = jax.jit(lambda o, d, a, t, p: fine_rank_sort(o, d, a, t, cl.aabb, p))
    dt = chain_time(f, o, d, alive, t_seed, prefix)
    print(f"  refinement sort cost {dt * 1e3:.2f} ms", flush=True)

    # and the real kernel on both orderings
    for label, idx in (("coarse", prefix), ("refined", refined)):
        ro, rd, ra, rt = take_rays(o, d, alive, t_seed, idx)
        kern = jax.jit(lambda o, d, al, ti: bk.intersect_triangles_bvh(
            o, d, al, ti, cl.aabb, cl.table_t, with_attrs=True,
            table_tr=cl.table_tr))
        dt = chain_time(kern, ro, rd, ra, rt)
        print(f"  kernel[{label}]  {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
