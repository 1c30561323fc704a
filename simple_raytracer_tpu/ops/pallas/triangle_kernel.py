"""Pallas TPU kernel: blockwise ray x triangle nearest-hit intersection.

The ray-triangle analog of blockwise attention (SURVEY §5): ray blocks stay
resident in VMEM while triangle tiles stream through, carrying a running
(t_min, argmin) instead of a running softmax.  Implements the exact
Moller-Trumbore semantics of the reference (render.cl:243-275: a == 0
rejected, u in [0,1], v >= 0, u+v <= 1, t > 0 strict) and the same
first-minimum tie-breaking as the jnp path (jnp.argmin first occurrence).

Layout:
  rays:      6 arrays (R, 1) f32 (origin / direction components)
  triangles: one packed (16, T) f32 table, rows
             [v0.xyz, e1.xyz, e2.xyz, active, pad...] — components on
             sublanes, triangles on lanes, so every (BR,1)x(1,BT)
             broadcast lands on the full 8x128 VPU grid
  out:       t (R, 1) f32 (inf on miss), idx (R, 1) i32

Grid is (ray_blocks, tri_blocks) with the triangle dimension innermost;
the output block for ray block i is revisited across j and accumulated
in place (first iteration initializes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3


def _kernel(ox, oy, oz, dx, dy, dz, tri, t_ref, idx_ref, *, block_t):
    j = pl.program_id(1)

    v0x = tri[0:1, :]
    v0y = tri[1:2, :]
    v0z = tri[2:3, :]
    e1x = tri[3:4, :]
    e1y = tri[4:5, :]
    e1z = tri[5:6, :]
    e2x = tri[6:7, :]
    e2y = tri[7:8, :]
    e2z = tri[8:9, :]
    act = tri[9:10, :]

    rdx = dx[:]
    rdy = dy[:]
    rdz = dz[:]

    # h = cross(d, e2)    (render.cl:250)
    hx = rdy * e2z - rdz * e2y
    hy = rdz * e2x - rdx * e2z
    hz = rdx * e2y - rdy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a

    # s = o - v0          (render.cl:257)
    sx = ox[:] - v0x
    sy = oy[:] - v0y
    sz = oz[:] - v0z
    u = f * (sx * hx + sy * hy + sz * hz)

    # q = cross(s, e1)    (render.cl:263)
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

    t_min = jnp.min(t, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) + j * block_t
    idx_min = jnp.min(jnp.where(t == t_min, col, 2 ** 30), axis=1,
                      keepdims=True)

    @pl.when(j == 0)
    def _():
        t_ref[...] = t_min
        idx_ref[...] = idx_min

    @pl.when(j > 0)
    def _():
        better = t_min < t_ref[...]
        t_ref[...] = jnp.where(better, t_min, t_ref[...])
        idx_ref[...] = jnp.where(better, idx_min, idx_ref[...])


def pack_triangles(tr) -> jnp.ndarray:
    """TrianglesSoA -> (16, T) kernel table (v0, e1=v1-v0, e2=v2-v0,
    active)."""
    e1 = tr.v1 - tr.v0
    e2 = tr.v2 - tr.v0
    t = tr.v0.x.shape[0]
    zeros = jnp.zeros((t,), jnp.float32)
    return jnp.stack([
        tr.v0.x, tr.v0.y, tr.v0.z,
        e1.x, e1.y, e1.z,
        e2.x, e2.y, e2.z,
        tr.active.astype(jnp.float32),
        zeros, zeros, zeros, zeros, zeros, zeros,
    ])


@functools.partial(jax.jit, static_argnames=("block_r", "block_t",
                                             "interpret"))
def intersect_triangles_pallas(o: Vec3, d: Vec3, tri_table: jnp.ndarray,
                               block_r: int = 256, block_t: int = 512,
                               interpret: bool = False):
    """(R,) rays x packed (16, T) triangles -> (t_best, idx_best).

    Same contract as intersect.intersect_triangles: t is inf on miss, idx
    is the first triangle attaining the minimum t."""
    n_rays = o.x.shape[0]
    n_tris = tri_table.shape[1]
    pad_r = (-n_rays) % block_r
    pad_t = (-n_tris) % block_t

    def col(c):
        return jnp.pad(c, (0, pad_r)).reshape(-1, 1)

    tri = jnp.pad(tri_table, ((0, 0), (0, pad_t)))
    rp = n_rays + pad_r
    tp = n_tris + pad_t
    grid = (rp // block_r, tp // block_t)

    ray_spec = pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    t_best, idx = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t),
        grid=grid,
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec((16, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=45 * rp * tp, bytes_accessed=rp * 4 * 8 + tp * 4 * 16,
            transcendentals=0),
        interpret=interpret,
    )(col(o.x), col(o.y), col(o.z), col(d.x), col(d.y), col(d.z), tri)

    return t_best[:n_rays, 0], idx[:n_rays, 0]
