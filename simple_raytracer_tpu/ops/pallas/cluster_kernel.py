"""Pallas TPU kernel: BVH-clustered ray x triangle intersection with
per-ray-block packet culling.

The TPU-native answer to BVH traversal (SURVEY §5): instead of per-ray
stacks (divergent, gather-heavy — hostile to 8x128 SIMD), the SAH BVH is
cut into fixed-size spatial clusters (accel.build_clusters) and each ray
BLOCK walks the cluster list with scalar control flow: a cheap vector slab
test against the cluster AABB decides whether the (BR, K) Moller-Trumbore
tile runs at all.  Grid = ray blocks only; the cluster loop lives INSIDE
the kernel, so a skipped cluster costs a few vector ops and NO memory
traffic — its triangle tile is DMA'd from HBM into VMEM scratch only on
demand.  (A two-dimensional grid pays pipeline+DMA overhead per cell even
when predicated off, which measured slower than brute force.)

Skipped work the dense XLA path cannot express:
  - spatial: the slab far bound is the block's current best t, so clusters
    behind known hits cull (the reference's tmax=tmin argument,
    render.cl:319,279-290)
  - liveness: blocks whose rays are all dead (terminated paths in later
    bounces) skip the entire cluster walk.

AABB semantics are conservative: a NaN slab result (ray origin exactly on
a box face with an axis-parallel direction) counts as a hit, so results
exactly match the brute-force path, which has no AABB test at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3


def _kernel(aabb, rays, table_hbm, out, t_scr, idx_scr, tri_buf, sem,
            *, block_k, n_clusters):
    t_scr[...] = jnp.full(t_scr.shape, jnp.inf, jnp.float32)
    idx_scr[...] = jnp.zeros(idx_scr.shape, jnp.int32)

    # rays packed (BR, 8): [o.xyz, d.xyz, alive, pad] — one array instead
    # of seven (BR, 1) blocks, which each pad to 128 lanes in VMEM
    rox = rays[:, 0:1]
    roy = rays[:, 1:2]
    roz = rays[:, 2:3]
    rdx = rays[:, 3:4]
    rdy = rays[:, 4:5]
    rdz = rays[:, 5:6]
    inv_x = 1.0 / rdx
    inv_y = 1.0 / rdy
    inv_z = 1.0 / rdz
    live = rays[:, 6:7] > 0.0

    def visit(c, _):
        t_best = t_scr[...]

        # slab AABB test (intersection_aabb, render.cl:279-290), far bound
        # = running best t; aabb scalars come from SMEM
        t1x = (aabb[c, 0] - rox) * inv_x
        t2x = (aabb[c, 3] - rox) * inv_x
        t1y = (aabb[c, 1] - roy) * inv_y
        t2y = (aabb[c, 4] - roy) * inv_y
        t1z = (aabb[c, 2] - roz) * inv_z
        t2z = (aabb[c, 5] - roz) * inv_z
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.minimum(jnp.maximum(t1z, t2z), t_best))
        maybe = jnp.logical_not(near >= far) & live

        @pl.when(jnp.any(maybe))
        def _():
            # fetch this cluster's triangle tile on demand: HBM -> VMEM
            cp = pltpu.make_async_copy(
                table_hbm.at[:, pl.ds(pl.multiple_of(c * block_k, block_k),
                                      block_k)],
                tri_buf, sem)
            cp.start()
            cp.wait()

            v0x = tri_buf[0:1, :]
            v0y = tri_buf[1:2, :]
            v0z = tri_buf[2:3, :]
            e1x = tri_buf[3:4, :]
            e1y = tri_buf[4:5, :]
            e1z = tri_buf[5:6, :]
            e2x = tri_buf[6:7, :]
            e2y = tri_buf[7:8, :]
            e2z = tri_buf[8:9, :]
            act = tri_buf[9:10, :]
            gidx = tri_buf[10:11, :]          # global triangle index as f32

            # Moller-Trumbore (render.cl:243-275)
            hx = rdy * e2z - rdz * e2y
            hy = rdz * e2x - rdx * e2z
            hz = rdx * e2y - rdy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / a
            sx = rox - v0x
            sy = roy - v0y
            sz = roz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (rdx * qx + rdy * qy + rdz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            valid = (
                (a != 0.0)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > 0.0)
                & (act > 0.0)
            )
            t = jnp.where(valid, t, jnp.inf)
            local_t = jnp.min(t, axis=1, keepdims=True)
            local_if = jnp.min(
                jnp.where(t == local_t, gidx, jnp.float32(2e9)),
                axis=1, keepdims=True)
            better = local_t < t_scr[...]
            t_scr[...] = jnp.where(better, local_t, t_scr[...])
            idx_scr[...] = jnp.where(better, local_if.astype(jnp.int32),
                                     idx_scr[...])

        return 0

    @pl.when(jnp.any(live))
    def _():
        jax.lax.fori_loop(0, n_clusters, visit, 0)

    # single packed (BR, 8) output: [t, idx-as-f32-bits, pad...] — two
    # separate (BR, 1) outputs each pad to 128 lanes in VMEM/HBM traffic
    zeros = jnp.zeros(t_scr.shape, jnp.float32)
    out[...] = jnp.concatenate(
        [t_scr[...], pltpu.bitcast(idx_scr[...], jnp.float32)]
        + [zeros] * 6, axis=1)


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def intersect_triangles_clustered(o: Vec3, d: Vec3, alive: jnp.ndarray,
                                  aabb: jnp.ndarray, table: jnp.ndarray,
                                  block_r: int = 512,
                                  interpret: bool = False):
    """(R,) rays x clustered triangles -> (t_best (R,), idx_best (R,) i32).

    `alive`: (R,) f32 mask — dead rays never trigger cluster work.
    `aabb`: (C, 8) f32, `table`: (16, C*K) f32 from the scene build."""
    n_rays = o.x.shape[0]
    n_clusters = aabb.shape[0]
    block_k = table.shape[1] // max(n_clusters, 1)
    pad_r = (-n_rays) % block_r

    def col(c):
        return jnp.pad(c, (0, pad_r))

    rays = jnp.stack([col(o.x), col(o.y), col(o.z), col(d.x), col(d.y),
                      col(d.z), col(alive),
                      jnp.zeros(n_rays + pad_r, jnp.float32)], axis=-1)

    rp = n_rays + pad_r
    grid = (rp // block_r,)

    ray_spec = pl.BlockSpec((block_r, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, n_clusters=n_clusters),
        grid=grid,
        in_specs=[
            # whole cluster AABB table in SMEM (C*8 scalars)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec,
        ] + [
            # full triangle table stays in HBM; tiles are DMA'd on demand
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((block_r, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
            pltpu.VMEM((16, block_k), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(aabb, rays, table)

    t_best = out[:n_rays, 0]
    idx = jax.lax.bitcast_convert_type(out[:n_rays, 1], jnp.int32)
    return t_best, idx
