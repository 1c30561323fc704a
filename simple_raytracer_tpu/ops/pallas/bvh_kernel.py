"""Pallas TPU kernel: BVH-clustered ray x triangle intersection with an
XLA-side visit prepass and a VMEM-resident triangle table.

Second-generation mesh kernel (it replaced the round-1 DMA cluster
kernel).  Four structural changes, each fixing a measured bottleneck:

1. **Visit decisions move OUT of the kernel.**  The per-(ray, cluster)
   slab test runs as ordinary fused XLA ops in (C, R) orientation —
   clusters on sublanes, rays on lanes — and reduces to a per-(ray-block,
   cluster) visit bitmask + count that enter the kernel as SMEM scalars.
   In-kernel per-cluster slab tests on (BR, 1) vectors waste 127/128 VPU
   lanes (~0.8 us per cluster per block); the dense XLA slab runs at full
   lane width and fuses.  (A lane-wide in-kernel slab is blocked by
   Mosaic: dynamic lane slices must be 128-aligned, so a (BR, C) mask
   cannot be column-sliced per cluster.)

2. **The triangle table lives in VMEM for the whole kernel.**  The
   round-1 kernel DMA'd each visited cluster's tile from HBM and waited
   on it serially (~2 us latency per visit, which forced K=1024 and made
   culling coarse).  Small-to-mid meshes fit in VMEM outright, so a
   visited tile is an aligned slice — no DMA, no wait, and K drops to
   128 for 8x finer culling.  Larger scenes stream the same table from
   HBM with double-buffered per-visit DMA over an in-kernel compacted
   visit list (_kernel_hbm), hiding the copy latency behind the
   intersection math.

3. **The slab far bound is seeded with the ray's current best t**
   (sphere/plane hits from the dense pass), so secondary rays that hit
   the ground plane cull every cluster behind it — the reference's
   tmax=tmin argument (render.cl:319) carried across primitive types.

3b. **Ordered traversal with a live-t re-slab gate.**  Clusters are
   processed in a global front-to-back order (argsort of box-center
   distance from the mean live-ray origin, computed host-of-kernel in
   XLA), and immediately before each cluster's Moller-Trumbore pass its
   AABB is re-tested against the CURRENT per-ray best t (which only
   tightens as the block progresses).  Clusters behind already-found
   hits are skipped entirely — the standard BVH far-bound argument: any
   intersection inside a box lies at a ray parameter within the box's
   slab interval, so an empty interval under the live t bound proves no
   closer hit exists there.  Ordering and skipping are result-neutral;
   on an 82K-triangle mesh this cuts the visited-tile work several-fold
   for primary rays into dense geometry.

4. **Every array is in a dense transposed layout.**  (N, 8)-style arrays
   pad their minor dim to 128 lanes on TPU (16x physical inflation), and
   profiling showed the padded ray/output copies alone cost more than the
   intersection math.  Rays are (8, R), the output is (2, R), per-ray
   running state is (1, BR), and Moller-Trumbore runs in (K, BR)
   orientation with triangle attributes as (K, 1) sublane columns sliced
   straight from the (C*K, 128) table.

5. **A PACKED transposed table for streaming** (round 3).  The (K, 128)
   row layout wastes 107 of 128 lanes per DMA'd row (512 B/triangle for
   84 B of data); `table_tr` packs each cluster as one (24, 128) tile —
   attributes on sublanes, triangles on lanes, 96 B/triangle — and the
   kernel restores MT orientation with one exact one-hot MXU transpose
   per visited cluster (`_tile_transpose`).  The same layout gives the
   megakernel VMEM residence up to ~109K triangles
   (bounce_kernel.MEGA_PACKED_MAX_CLUSTERS).

6. **Optional two-level prepass** (round 3).  `prepass_level="group"`
   moves the dense XLA slab from superclusters (16 clusters) to GROUPS
   of 16 supers — ~15x less prepass work at 82K triangles — and refines
   groups -> supers -> children with two in-kernel slab levels.
   Result-identical either way.

Culling is conservative exactly like the reference's AABB gate
(render.cl:316-331): a cluster is visited if ANY ray in the block might
hit it, NaN slab results count as hits, and misses only skip work —
results are bit-identical to the brute-force path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3


def _visit_prepass(o, d, alive, t_init, aabb: jnp.ndarray, block_r: int,
                   pad_r: int):
    """Rays x (C, 8) cluster AABBs -> per-block visit bitmask.

    Returns (visits (B, W) i32 bit-packed, counts (B,) i32).  A cluster is
    visited by a block iff some live ray's slab interval [near, far] is
    nonempty, with far capped by the ray's incoming best t.  The slab math
    mirrors intersection_aabb (render.cl:279-290) except the interval is
    CLOSED: a perfectly flat cluster box (axis-aligned planar triangles —
    a floor grid, a cube face) has near == far exactly at the hit, and
    the reference's strict `tmin < tmax` would cull geometry the dense
    path renders.  (The reference only gates whole models, which are
    rarely flat; clusters subdivide meshes, which routinely are.)

    The `near >= 1e38` term rejects the bucket-padding SENTINELS (boxes
    with every plane at +3e38): under a closed interval a far point box
    is otherwise VISITED by any no-hit ray whose t products all overflow
    equal (+inf == +inf), e.g. every sky ray into the all-positive
    octant.  For a normalized direction |1/d| >= 1, so a sentinel's
    all-positive slab entry is >= 3e38 - |o| >= 1e38, while any real
    box's entry t is far below it — the term can only cull sentinels.
    NaN results stay conservative (both comparisons are false -> the ray
    counts as a hit), exactly like the kernel-side gates.

    Everything is computed in (C, R) orientation — clusters on sublanes,
    rays on lanes — so the per-block reduction is a minor-axis reshape +
    lane reduce.  The (R, C) orientation costs two multi-ms layout-moving
    reshapes at 1080p (profiled); this one fuses completely."""
    pad = lambda v: jnp.pad(v, (0, pad_r))
    ox, oy, oz = pad(o.x)[None], pad(o.y)[None], pad(o.z)[None]   # (1, R)
    inx = 1.0 / pad(d.x)[None]
    iny = 1.0 / pad(d.y)[None]
    inz = 1.0 / pad(d.z)[None]
    live = pad(alive)[None] > 0.0
    t_best = pad(t_init)[None]

    col = lambda j: aabb[:, j][:, None]                           # (C, 1)
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
                      jnp.minimum(jnp.maximum(t1z, t2z), t_best))
    maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live                   # (C, R)

    c, r = maybe.shape
    n_blocks = r // block_r
    visits_t = maybe.reshape(c, n_blocks, block_r).any(axis=2)    # (C, B)
    counts = visits_t.sum(axis=0, dtype=jnp.int32)
    # pack into per-block i32 bitmask words (SMEM is ~1 MB and mostly
    # reserved; a (B, C) i32 table overflows it at 1080p block counts)
    n_words = (c + 31) // 32
    pad_c = n_words * 32 - c
    bits = jnp.pad(visits_t, ((0, pad_c), (0, 0))).astype(jnp.uint32)
    weights = (jnp.uint32(1) << (jnp.arange(n_words * 32, dtype=jnp.uint32)
                                 % 32)).reshape(n_words, 32)
    packed = (bits.reshape(n_words, 32, n_blocks) * weights[:, :, None]
              ).sum(axis=1, dtype=jnp.uint32).T.astype(jnp.int32)
    return packed, counts


# table_t column layout (scene build bakes this order):
#   0-2 v0.xyz, 3-5 e1.xyz, 6-8 e2.xyz, 9-17 n0/n1/n2 vertex normals,
#   18 material index (f32), 19 active, 20 global index (f32)
_N_ATTRS = 19   # cols 0..18, returned for the winning triangle


def _slab_word(tile, rox, roy, roz, inx, iny, inz, live, t_scr):
    """Slab-test a (G, 8) AABB tile against the block's rays under the
    LIVE best-t far bound; returns an i32 word whose bit g says whether
    any live ray's interval for box g is nonempty.  NaNs stay
    conservative via ~(near > far) exactly like the prepass.  The hit
    flags leave vector-land as one exact f32 sum of powers of two
    (Mosaic cannot scalar-read VMEM vectors); G <= 24 keeps the sum
    exact in f32."""
    g = tile.shape[0]
    col = lambda j: tile[:, j:j + 1]
    t1x = (col(0) - rox) * inx
    t2x = (col(3) - rox) * inx
    t1y = (col(1) - roy) * iny
    t2y = (col(4) - roy) * iny
    t1z = (col(2) - roz) * inz
    t2z = (col(5) - roz) * inz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                  jnp.maximum(t1y, t2y)),
                      jnp.minimum(jnp.maximum(t1z, t2z), t_scr[...]))
    maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live        # (G, BR)
    flags = jnp.max(jnp.where(maybe, 1.0, 0.0), axis=1, keepdims=True)
    weights = (2.0 ** jax.lax.broadcasted_iota(
        jnp.int32, (g, 1), 0).astype(jnp.float32))
    return jnp.sum(flags * weights).astype(jnp.int32)


def _reslab_flag(c, aabb, rox, roy, roz, inx, iny, inz, live, t_scr,
                 group):
    """Re-test cluster c's AABB against the CURRENT best t — a scalar
    0/1 flag saying whether any live ray's slab interval is still
    nonempty.  Tests c's whole aligned `group` (VMEM dynamic sublane
    slices must be group-aligned) and extracts c's bit."""
    g0 = (c // group) * group
    tile = aabb[pl.ds(pl.multiple_of(g0, group), group), :]
    word = _slab_word(tile, rox, roy, roz, inx, iny, inz, live, t_scr)
    return (word >> (c % group)) & 1


def _kernel(visit, count, order, rays, table_t, aabb, out, t_scr, idx_scr,
            attr_scr, *, block_l, n_clusters, with_attrs):
    """VMEM-resident-table variant: a visited cluster's tile is an
    aligned slice of the resident table — no data movement at all.
    Clusters run in the global front-to-back `order` with the live-t
    re-slab gate, so tiles behind found hits are skipped."""
    b = pl.program_id(0)     # visit/count are whole SMEM arrays (block
    t_scr[...] = rays[7:8, :]                      # tables), indexed per block
    idx_scr[...] = jnp.full(idx_scr.shape, -1, jnp.int32)
    if with_attrs:
        attr_scr[...] = jnp.zeros(attr_scr.shape, jnp.float32)

    rox = rays[0:1, :]
    roy = rays[1:2, :]
    roz = rays[2:3, :]
    inx = 1.0 / rays[3:4, :]
    iny = 1.0 / rays[4:5, :]
    inz = 1.0 / rays[5:6, :]
    live = rays[6:7, :] > 0.0

    def visit_cluster(j, _):
        c = order[j]
        word = visit[b, c // 32]
        bit = (word >> (c % 32)) & 1

        @pl.when(bit > 0)
        def _():
            hit = _reslab_flag(c, aabb, rox, roy, roz, inx, iny, inz,
                               live, t_scr, group=8)

            @pl.when(hit > 0)
            def _():
                row0 = pl.multiple_of(c * block_l, block_l)
                tile = table_t[pl.ds(row0, block_l), :]
                _mt_update(tile, rays, t_scr, idx_scr, attr_scr, with_attrs)

        return 0

    @pl.when(count[b] > 0)
    def _():
        jax.lax.fori_loop(0, n_clusters, visit_cluster, 0)

    # packed output rows: [t (inf when no triangle won), idx bits,
    #                      19 winner attributes when with_attrs]
    no_win = idx_scr[...] < 0
    t_out = jnp.where(no_win, jnp.float32(jnp.inf), t_scr[...])
    rows = [t_out, pltpu.bitcast(idx_scr[...], jnp.float32)]
    if with_attrs:
        rows.append(attr_scr[...])
    out[...] = jnp.concatenate(rows, axis=0)


def _mt_update(tile, rays, t_scr, idx_scr, attr_scr, with_attrs):
    """Moller-Trumbore (render.cl:243-275) for one (K, 32) triangle tile
    against the block's rays in (K, BR) orientation, updating the running
    (t, idx, attrs) state.  Shared by the VMEM path (tile = aligned table
    slice) and the HBM path (tile = DMA'd scratch).

    with_attrs also extracts the winner's 19 shading attributes HERE: any
    post-kernel row gather of (R, F) shading data re-scans its
    128-lane-padded buffer once per consumed column (measured 5.7 ms per
    column at 1080p, and XLA folds explicit transposes back into
    bitcasts).  `sel` is a one-hot over the tile (winner matched by its
    unique global index), so one MXU contraction (19, K) x (K, BR)
    reproduces the attribute row exactly — 0/1 weights select a single
    table entry per ray with no rounding."""
    rox = rays[0:1, :]
    roy = rays[1:2, :]
    roz = rays[2:3, :]
    rdx = rays[3:4, :]
    rdy = rays[4:5, :]
    rdz = rays[5:6, :]
    sl = lambda j: tile[:, j:j + 1]                    # (K, 1)
    v0x, v0y, v0z = sl(0), sl(1), sl(2)
    e1x, e1y, e1z = sl(3), sl(4), sl(5)
    e2x, e2y, e2z = sl(6), sl(7), sl(8)
    act = sl(19)
    gidx = sl(20)

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
    local_t = jnp.min(t, axis=0, keepdims=True)        # (1, BR)
    local_if = jnp.min(jnp.where(t == local_t, gidx, jnp.float32(2e9)),
                       axis=0, keepdims=True)
    # lowest-global-index tie-break ACROSS clusters too: traversal order
    # is a camera-dependent heuristic, so a strict < would let equal-t
    # duplicates flicker between frames and diverge from the dense
    # path's argmin (first = lowest index) semantics.  idx -1 (the
    # non-triangle t_init seed) never loses a tie: the kernel reports
    # only strictly closer triangle hits against the seed.
    prev = t_scr[...]
    better = (local_t < prev) | (
        (local_t == prev) & (local_if < idx_scr[...].astype(jnp.float32)))
    t_scr[...] = jnp.where(better, local_t, prev)
    idx_scr[...] = jnp.where(better, local_if.astype(jnp.int32),
                             idx_scr[...])
    if with_attrs:
        sel = jnp.where((t == local_t) & (gidx == local_if), 1.0, 0.0)
        new_attr = jax.lax.dot_general(
            tile[:, 0:_N_ATTRS], sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (19, BR)
        attr_scr[...] = jnp.where(better, new_attr, attr_scr[...])


_SUPER = 16     # clusters per supercluster (the HBM path's coarse level);
                # 16 bits sum exactly in f32 (max 65535 < 2^24)

_TROWS = 24     # rows per cluster in the PACKED transposed table: 21
                # attribute rows (same 0-20 column meaning as table_t)
                # padded to a sublane multiple of 8.  The padded (K, 128)
                # row layout DMAs 512 B per triangle of which 428 B are
                # zero lanes; the packed (24, 128) tile (attributes on
                # sublanes, the cluster's K<=128 triangles on lanes) is
                # 96 B/triangle — a 5.3x HBM-bandwidth cut for the
                # streaming path, paid back with ONE in-kernel (24, 128)
                # -> (128, 24) transpose per visited cluster (~0.1 us on
                # the XLU vs ~15 us of DMA wall saved per visit).

_SUB = 128      # rays per MT sub-block (one lane group — the finest
                # granularity static lane slicing allows)

def _prof_knob(name: str) -> bool:
    """Profiling knobs (WRONG RESULTS when set — never in product
    paths): SRT_BVH_NO_MT=1 skips every Moller-Trumbore commit (times
    the pure traversal+slab floor); SRT_BVH_NO_SUBWORD=1 forces every
    sub-block of a slab-hit cluster through MT (times MT with the
    per-128-ray gate off).  Read at trace time (sweep_config6 A/Bs)."""
    import os
    return os.environ.get(name) == "1"

_GROUP = 16     # superclusters per top-level GROUP when the prepass runs
                # two-level (prepass_level="group"): the dense XLA slab
                # then costs (S/16, R) instead of (S, R) — ~15x less of
                # the dominant per-bounce XLA work at 82K triangles —
                # and the kernel refines groups -> supers -> children
                # with two in-kernel _slab_word levels.


def _mt_commit(t, valid, gidx, atile, t_scr, idx_scr, attr_scr, t_sub, s,
               with_attrs):
    """Shared commit epilogue of both Moller-Trumbore forms (_mt_update_sub
    and _mt_update_sub_mxu): mask invalid lanes, take the per-lane min-t
    winner with the cross-cluster lowest-global-index tie-break, mirror
    the tightened t into the (SB, 128) sub-layout scratch, and (optional)
    extract the winner's 19 attr rows with an exact one-hot matmul.
    `atile` is the (K, 24) MT-orientation tile (triangles on rows);
    `gidx` broadcasts against t ((K, 1) or (K, 128))."""
    sl = slice(s * _SUB, (s + 1) * _SUB)
    t = jnp.where(valid, t, jnp.inf)
    local_t = jnp.min(t, axis=0, keepdims=True)        # (1, 128)
    local_if = jnp.min(jnp.where(t == local_t, gidx, jnp.float32(2e9)),
                       axis=0, keepdims=True)
    # cross-cluster lowest-index tie-break, same as _mt_update above
    prev = t_scr[0:1, sl]
    better = (local_t < prev) | (
        (local_t == prev)
        & (local_if < idx_scr[0:1, sl].astype(jnp.float32)))
    t_new = jnp.where(better, local_t, prev)
    t_scr[0:1, sl] = t_new
    t_sub[s:s + 1, :] = t_new
    idx_scr[0:1, sl] = jnp.where(better, local_if.astype(jnp.int32),
                                 idx_scr[0:1, sl])
    if with_attrs:
        sel = jnp.where((t == local_t) & (gidx == local_if), 1.0, 0.0)
        new_attr = jax.lax.dot_general(
            atile[:, 0:_N_ATTRS], sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (19, 128)
        attr_scr[:, sl] = jnp.where(better, new_attr, attr_scr[:, sl])


def _mt_update_sub(tile, rays, t_scr, idx_scr, attr_scr, t_sub, s,
                   with_attrs):
    """_mt_update restricted to sub-block s's 128-lane ray slice.

    `s` must be a python int (static slices keep every lane access
    128-aligned)."""
    sl = slice(s * _SUB, (s + 1) * _SUB)
    rox = rays[0:1, sl]
    roy = rays[1:2, sl]
    roz = rays[2:3, sl]
    rdx = rays[3:4, sl]
    rdy = rays[4:5, sl]
    rdz = rays[5:6, sl]
    tl = lambda j: tile[:, j:j + 1]                    # (K, 1)
    e1x, e1y, e1z = tl(3), tl(4), tl(5)
    e2x, e2y, e2z = tl(6), tl(7), tl(8)
    act = tl(19)
    gidx = tl(20)

    hx = rdy * e2z - rdz * e2y
    hy = rdz * e2x - rdx * e2z
    hz = rdx * e2y - rdy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a
    sx = rox - tl(0)
    sy = roy - tl(1)
    sz = roz - tl(2)
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
    _mt_commit(t, valid, gidx, tile, t_scr, idx_scr, attr_scr, t_sub, s,
               with_attrs)


def _subbox_word(subb, c, s, sox, soy, soz, six, siy, siz, slive, t_sub):
    """Slab cluster c's 8 SUB-boxes (K/8-triangle slot ranges — see
    TriangleClustersSoA.sub_aabb) against sub-block s's 128 rays under
    that sub-block's LIVE best t; returns an i32 word whose bit j gates
    sub-box j's Moller-Trumbore.  A fourth, finest culling level — OPT-IN
    only (SRT_BVH_SUBBOX): measured on v5e at 82K tris it LOSES to plain
    per-sub-block MT at every division (48-51 vs 62.3 Mrays/s for
    div 8/4/2), because the incoherent-bounce cost floor is per-(block,
    cluster) slab work, which this level adds to, not the MT lanes it
    removes.  Same conservative slab semantics as every other gate
    (closed interval, NaN counts as hit, near >= 1e38 rejects sentinel
    boxes), so skips are result-neutral."""
    tile = subb[pl.ds(pl.multiple_of(c * 8, 8), 8), :]      # (8, 8)
    col = lambda j: tile[:, j:j + 1]
    sl = slice(s, s + 1)                                    # s is static
    ox, oy, oz = sox[sl, :], soy[sl, :], soz[sl, :]         # (1, 128)
    ix, iy, iz = six[sl, :], siy[sl, :], siz[sl, :]
    t1x = (col(0) - ox) * ix
    t2x = (col(3) - ox) * ix
    t1y = (col(1) - oy) * iy
    t2y = (col(4) - oy) * iy
    t1z = (col(2) - oz) * iz
    t2z = (col(5) - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                  jnp.maximum(t1y, t2y)),
                      jnp.minimum(jnp.maximum(t1z, t2z), t_sub[sl, :]))
    maybe = (jnp.logical_not((near > far) | (near >= 1.0e38))
             & slive[sl, :])                                # (8, 128)
    flags = jnp.max(jnp.where(maybe, 1.0, 0.0), axis=1, keepdims=True)
    pow2 = (2.0 ** jax.lax.broadcasted_iota(
        jnp.int32, (8, 1), 0).astype(jnp.float32))
    return jnp.sum(flags * pow2).astype(jnp.int32)


def _mt_gated_sub(tile, subb, c, s, rays, t_scr, idx_scr, attr_scr,
                  t_sub, sox, soy, soz, six, siy, siz, slive, sub_rows,
                  n_boxes, with_attrs):
    """Sub-box-gated Moller-Trumbore for one (visited cluster c,
    gated ray sub-block s): slab the n_boxes sub-boxes, then run
    _mt_update_sub on each hit (sub_rows, ·) STATIC slice of the
    MT-oriented tile value.  Static slices make the sub-tiles free —
    the first-cut form staged the tile in a VMEM scratch and dynamically
    sliced it from a fori_loop, and the staging copy + dynamic sublane
    slicing measured SLOWER than no gating at all (47.4 vs 58.8 Mrays/s
    at 82K tris).  The sub-box word is computed once against the t bound
    live at entry; MT commits inside the loop only tighten it, so later
    skips stay conservative."""
    bw = _subbox_word(subb, c, s, sox, soy, soz, six, siy, siz, slive,
                      t_sub)

    @pl.when(bw != 0)
    def _():
        for j in range(n_boxes):
            @pl.when(((bw >> j) & 1) > 0)
            def _(j=j):
                _mt_update_sub(tile[j * sub_rows:(j + 1) * sub_rows, :],
                               rays, t_scr, idx_scr, attr_scr, t_sub, s,
                               with_attrs)


def _tile_transpose(tile):
    """(24, 128) packed tile -> (128, 24) MT orientation, on the MXU.

    A one-hot f32 matmul is an EXACT permutation (every product is x*1
    or x*0 and each output sums one nonzero term — the same argument as
    the attr-extraction matmul above) and lowers to a single MXU pass;
    ``lax.transpose`` would lower to a Mosaic relayout inside the
    dynamic-trip DMA loop instead.  Written as tile^T @ eye via the
    (((0,), (0,))) contraction — the one dot_general form this kernel
    already ships on TPU (_mt_update's attr extraction)."""
    k = tile.shape[0]
    eye = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1), 1.0, 0.0)
    return jax.lax.dot_general(
        tile, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _mt_form() -> str:
    """Trace-time select of the Moller-Trumbore evaluation form for the
    PACKED streaming/VMEM kernels (SRT_BVH_MT env var):

    - "mt" — the (K, 1) x (1, 128) VPU broadcast form (_mt_update_sub).
    - "plucker" — the MXU bilinear form (_mt_update_sub_mxu): the same
      intersection predicate evaluated from Pluecker coordinates, where
      every per-(triangle, ray) quantity is a dot product of a per-tri
      coefficient vector with the per-ray vector [d, o x d, o, 1], so
      ONE (10, 6K) x (10, 128) matmul per (visited cluster, hit
      sub-block) replaces ~55 VPU ops per lane pair.  Same comparisons,
      same tie-breaks; t/u/v agree with the VPU form up to f32 rounding
      of the reassociated arithmetic (max 1.3e-5 relative on the test
      fixture; validated by
      tests/test_bvh_kernel.py::test_plucker_matches_dense).

    MEASURED AND REJECTED as a default (scripts/bench_plucker.py,
    config 6 at 1080p/4 bounces on v5e): plucker 204.7 ms / 40.5
    Mrays/s vs mt 131.8 ms / 62.9.  The MXU is the wrong unit for a
    contraction dim of 10: f32 dot_general at Precision.HIGHEST costs
    six bf16 passes, so the per-visit matmul is ~1.4 us where the VPU
    broadcast MT is ~0.2 us — the MXU only wins when the contraction
    amortizes the pass count (the one-hot transpose/attr extractions
    here contract over 24-128).  Lower matmul precision is not an out:
    bf16's 8 mantissa bits are far too coarse for the t comparisons and
    u/v boundary tests.  Kept as a knob for regression sweeps; this is
    the measured answer to the round-3 'branchless MT sub-tile select'
    question (TODO.md).

    Applies only when the finer sub-box gating is off (sub_rows == 0,
    the measured default) and the table is packed (table_tr)."""
    import os
    return os.environ.get("SRT_BVH_MT", "mt")


#: number of kernel traces that actually took the MXU Pluecker form —
#: lets tests prove the knob engaged instead of silently measuring "mt"
#: (advisor finding, round 3)
_PLUCKER_TRACES = 0


def _resolve_plucker(packed: bool, sub_rows: int) -> bool:
    """Trace-time resolution of the SRT_BVH_MT knob against its gating
    conditions, warning when the ask is silently unsatisfiable so a
    sweep combining knobs can't report 'plucker' numbers that actually
    measured the VPU form (advisor finding, round 3)."""
    if _mt_form() != "plucker":
        return False
    if packed and sub_rows == 0:
        global _PLUCKER_TRACES
        _PLUCKER_TRACES += 1
        return True
    import warnings
    why = [] if packed else ["the triangle table is not packed"]
    if sub_rows != 0:
        why.append("sub-box gating is on (SRT_BVH_SUBBOX)")
    warnings.warn(
        "SRT_BVH_MT=plucker ignored: " + " and ".join(why)
        + "; tracing the VPU 'mt' form instead", stacklevel=3)
    return False


def _plucker_lt(raw):
    """Per-cluster Pluecker coefficient matrix LT (10, 6K) from one
    UNTRANSPOSED (24, 128) packed tile (triangles on lanes; rows 0-20
    carry the table_t column meaning: v0, e1, e2, n0-n2, mat, act, gidx).

    Derivation (exact identities from the Moller-Trumbore quantities of
    render.cl:243-275, with n = e1 x e2, m = o x d, No = n . o):
      a     = e1 . (d x e2)          = -d . n
      u * a = (o - v0) . (d x e2)    =  d . (v0 x e2) + m . e2
      v * a = d . ((o - v0) x e1)    = -d . (v0 x e1) - m . e1
      t * a = e2 . ((o - v0) x e1)   =  No - n . v0
    so [u*a, v*a, a, t*a] are dot products of per-tri 10-vectors with
    the per-ray vector [d(3), m(3), o(3), 1].  Two more planes broadcast
    the tile's `act` and `gidx` rows over rays (coefficient = the row on
    the constant-1 slot; exact, every product is x*1 or x*0), so the
    non-attrs path never needs the (24, 128) -> (128, 24) transpose.
    The six (10, 128) plane matrices concatenate on lanes (128-aligned)
    into one LT the kernel contracts once per hit sub-block."""
    r = lambda j: raw[j:j + 1, :]
    v0x, v0y, v0z = r(0), r(1), r(2)
    e1x, e1y, e1z = r(3), r(4), r(5)
    e2x, e2y, e2z = r(6), r(7), r(8)
    act, gidx = r(19), r(20)
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    w1x = v0y * e1z - v0z * e1y            # v0 x e1
    w1y = v0z * e1x - v0x * e1z
    w1z = v0x * e1y - v0y * e1x
    w2x = v0y * e2z - v0z * e2y            # v0 x e2
    w2y = v0z * e2x - v0x * e2z
    w2z = v0x * e2y - v0y * e2x
    pd = nx * v0x + ny * v0y + nz * v0z    # n . v0
    zero = jnp.zeros_like(act)
    z3 = [zero, zero, zero]
    cu = [w2x, w2y, w2z, e2x, e2y, e2z, *z3, zero]
    cv = [-w1x, -w1y, -w1z, -e1x, -e1y, -e1z, *z3, zero]
    ca = [-nx, -ny, -nz, *z3, *z3, zero]
    ct = [*z3, *z3, nx, ny, nz, -pd]
    cact = [*z3, *z3, *z3, act]
    cgid = [*z3, *z3, *z3, gidx]
    stack = lambda rows: jnp.concatenate(rows, axis=0)        # (10, 128)
    return jnp.concatenate(
        [stack(cu), stack(cv), stack(ca), stack(ct), stack(cact),
         stack(cgid)], axis=1)                                # (10, 6K)


def _mt_update_sub_mxu(lt, rays, t_scr, idx_scr, attr_scr, t_sub, s,
                       with_attrs, atile=None):
    """MXU form of _mt_update_sub for one (visited cluster, hit 128-lane
    ray sub-block): one dot_general of the cluster's Pluecker matrix LT
    (10, 6K) against the sub-block's ray vector (10, 128) yields the six
    (K, 128) planes [u*a, v*a, a, t*a, act, gidx]; the VPU epilogue is
    ~18 ops/pair (divide through by a, the SAME validity comparisons as
    _mt_update_sub, running-min commit with the cross-cluster
    lowest-global-index tie-break).  `atile` is the transposed (K, 24)
    tile, needed only for with_attrs winner extraction."""
    k = lt.shape[1] // 6
    sl = slice(s * _SUB, (s + 1) * _SUB)
    rox = rays[0:1, sl]
    roy = rays[1:2, sl]
    roz = rays[2:3, sl]
    rdx = rays[3:4, sl]
    rdy = rays[4:5, sl]
    rdz = rays[5:6, sl]
    mx = roy * rdz - roz * rdy             # m = o x d
    my = roz * rdx - rox * rdz
    mz = rox * rdy - roy * rdx
    one = jnp.ones_like(rox)
    rv = jnp.concatenate(
        [rdx, rdy, rdz, mx, my, mz, rox, roy, roz, one], axis=0)
    planes = jax.lax.dot_general(
        lt, rv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # (6K, 128)
    unum = planes[0 * k:1 * k]
    vnum = planes[1 * k:2 * k]
    a = planes[2 * k:3 * k]
    tnum = planes[3 * k:4 * k]
    act = planes[4 * k:5 * k]
    gidx = planes[5 * k:6 * k]
    f = 1.0 / a
    u = f * unum
    v = f * vnum
    t = f * tnum
    valid = (
        (a != 0.0)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > 0.0)
        & (act > 0.0)
    )
    _mt_commit(t, valid, gidx, atile, t_scr, idx_scr, attr_scr, t_sub, s,
               with_attrs)


def _kernel_hbm(visit, count, order, rays, table_hbm, rays_sub, aabb,
                sup, subb, out, t_scr, idx_scr, attr_scr, t_sub, lst, buf,
                sems, wbuf, *, block_l, n_clusters, with_attrs, n_sub,
                packed, two_level, sub_rows, n_boxes, packets, n_slots):
    """HBM-table variant for meshes too large for VMEM residence.

    THREE-level culling, each level finer than the last:

    1. The XLA prepass gates SUPERCLUSTERS (groups of _SUPER clusters —
       a (C, R) per-ray slab at 82K triangles costs ~16 ms/bounce, a
       (C/16, R) one ~1 ms) per ray block.
    2. For each visited supercluster the kernel slab-tests its children
       at full lane width in (16, BR) orientation against the running
       best t; the per-child hit flags leave vector-land as one exact
       f32 sum of powers of two (Mosaic cannot scalar-read VMEM
       vectors), and the set bits append their cluster ids to an SMEM
       list.  The list is then streamed with double-buffered DMA — the
       next tile's fetch overlaps the current tile's Moller-Trumbore.
    3. At DMA-issue time each listed cluster is re-slabbed per 128-lane
       SUB-BLOCK against the LIVE best t (`_sub_word`, using the (F*SB,
       128) transposed ray layout prepared in XLA), and Moller-Trumbore
       runs ONLY on the sub-blocks whose bit is set.  Secondary-bounce
       rays are direction-incoherent, so the union of clusters a
       1536-ray block must visit is far larger than what any 128 rays
       need: per-sub-block gating cuts the intersected lanes by the
       coherence ratio (up to 12x for the sparse late bounces where a
       block has a handful of live rays).  Bit-identical results — a
       skipped sub-block provably has no slab interval under the live
       bound, so no closer hit exists there.

    Superclusters are scanned in the global front-to-back `order`, so
    the SMEM list comes out approximately depth-sorted and the live-t
    re-slab skips (and never fetches) tiles behind hits found earlier
    in the list (the carried per-slot word keeps the skip decision and
    the MT gate consistent across the DMA pipeline)."""
    b = pl.program_id(0)
    t_scr[...] = rays[7:8, :]
    idx_scr[...] = jnp.full(idx_scr.shape, -1, jnp.int32)
    if with_attrs:
        attr_scr[...] = jnp.zeros(attr_scr.shape, jnp.float32)

    rox = rays[0:1, :]
    roy = rays[1:2, :]
    roz = rays[2:3, :]
    inx = 1.0 / rays[3:4, :]
    iny = 1.0 / rays[4:5, :]
    inz = 1.0 / rays[5:6, :]
    live = rays[6:7, :] > 0.0

    # per-sub-block ray rows in (field * SB + s, 128) layout: origins,
    # 1/direction, live mask, and the LIVE best t (t_sub scratch, kept
    # in sync by _mt_update_sub)
    rs = rays_sub[...]
    sb = lambda f: rs[f * n_sub:(f + 1) * n_sub, :]    # (SB, 128)
    sox, soy, soz = sb(0), sb(1), sb(2)
    six = 1.0 / sb(3)
    siy = 1.0 / sb(4)
    siz = 1.0 / sb(5)
    slive = sb(6) > 0.0
    t_sub[...] = sb(7)
    pow2 = (2.0 ** jax.lax.broadcasted_iota(
        jnp.int32, (n_sub, 1), 0).astype(jnp.float32))

    iota16 = jax.lax.broadcasted_iota(jnp.int32, (_SUPER, 1), 0)

    # profiling-only ablations (scripts/profile_compact7.py), read at
    # TRACE time: "subword" replaces the per-visit re-slab word with
    # all-ones so its cost drops out of the per-visit total (every
    # sub-block then runs MT — the gate only ever skips work, so results
    # are identical); "nowork" empties the per-visit body entirely
    # (WRONG results; isolates list-build + loop skeleton + DMA issue).
    import os as _os
    _ablate = _os.environ.get("SRT_BVH_ABLATE", "")

    def _sub_word(c):
        """Slab cluster c against every ray in the (SB, 128) layout under
        the live per-sub-block t bound; one i32 word whose bit s gates
        sub-block s's Moller-Trumbore.  Box coords come out of the VMEM
        aabb as one-hot masked reductions (dynamic sublane reads must be
        group-aligned; a (16, 1) reduce to scalar is ~free)."""
        if "subword" in _ablate:
            return jnp.int32((1 << n_sub) - 1)
        g0 = (c // _SUPER) * _SUPER
        tile = aabb[pl.ds(pl.multiple_of(g0, _SUPER), _SUPER), :]
        onehot = jnp.where(iota16 == c % _SUPER, 1.0, 0.0)
        # (1, 1) VECTOR reductions rather than scalars: the (1, 1)
        # result broadcasts over (SB, 128) purely vector-side, skipping
        # six vector->scalar readouts per visited cluster (measured
        # neutral on config 6, kept as the cheaper form)
        bx = lambda k: jnp.sum(tile[:, k:k + 1] * onehot, keepdims=True)
        t1x = (bx(0) - sox) * six
        t2x = (bx(3) - sox) * six
        t1y = (bx(1) - soy) * siy
        t2y = (bx(4) - soy) * siy
        t1z = (bx(2) - soz) * siz
        t2z = (bx(5) - soz) * siz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.minimum(jnp.maximum(t1z, t2z), t_sub[...]))
        maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & slive   # (SB, 128)
        flags = jnp.max(jnp.where(maybe, 1.0, 0.0), axis=1, keepdims=True)
        return jnp.sum(flags * pow2).astype(jnp.int32)

    n_super = n_clusters // _SUPER

    def visit_super(s, n):
        """Fine slab for supercluster s's 16 children; append hits."""
        tile = aabb[pl.ds(s * _SUPER, _SUPER), :]      # (16, 8)
        word = _slab_word(tile, rox, roy, roz, inx, iny, inz, live, t_scr)

        def append_bits(n):
            def bit(i, n):
                hit = ((word >> i) & 1) > 0

                @pl.when(hit)
                def _():
                    lst[0, n] = s * _SUPER + i
                return jnp.where(hit, n + 1, n)
            return jax.lax.fori_loop(0, _SUPER, bit, n)

        return jax.lax.cond(word != 0, append_bits, lambda nn: nn, n)

    if two_level:
        # prepass bits gate GROUPS of _GROUP supers; refine in-kernel
        # with a super-level slab before the child-level one
        def visit_group(g, n):
            tile = sup[pl.ds(pl.multiple_of(g * _GROUP, _GROUP), _GROUP),
                       :]
            word = _slab_word(tile, rox, roy, roz, inx, iny, inz, live,
                              t_scr)

            def super_bits(nn):
                def bit(i, nn):
                    return jax.lax.cond(
                        ((word >> i) & 1) > 0,
                        lambda m: visit_super(g * _GROUP + i, m),
                        lambda m: m, nn)
                return jax.lax.fori_loop(0, _GROUP, bit, nn)

            return jax.lax.cond(word != 0, super_bits, lambda nn: nn, n)

        def scan_top(j, n):
            g = order[j]
            bit = (visit[b, g // 32] >> (g % 32)) & 1
            return jax.lax.cond(bit > 0, lambda nn: visit_group(g, nn),
                                lambda nn: nn, n)

        n_top = n_super // _GROUP
    else:
        def scan_top(j, n):
            s = order[j]
            bit = (visit[b, s // 32] >> (s % 32)) & 1
            return jax.lax.cond(bit > 0, lambda nn: visit_super(s, nn),
                                lambda nn: nn, n)

        n_top = n_super

    # empty blocks (most of the sky, every fully-dead block) skip even
    # the top-level scan — the prepass already counted their visits
    n = jax.lax.cond(count[b] > 0,
                     lambda _: jax.lax.fori_loop(0, n_top, scan_top, 0),
                     lambda _: 0, 0)

    def dma(j, slot):
        # structural OOB guard: kernel-side two-level padding ids
        # (>= n_table_clusters) have NO table rows.  The slab gates
        # provably cull their sentinel boxes for real rays, but a
        # NaN-state ray visits EVERYTHING by conservative design — clamp
        # so even that worst case lands on an existing (real) cluster
        # tile; the duplicate visit is idempotent under the running-min
        # commit.  Pallas refs on TPU do NOT clamp dynamic slices.
        n_table_clusters = (table_hbm.shape[0] if packed
                            else table_hbm.shape[0] // block_l)
        c = jnp.minimum(lst[0, j], n_table_clusters - 1)
        if packed:
            # one (24, 128) packed tile per cluster — 96 B/triangle
            return pltpu.make_async_copy(table_hbm.at[c], buf.at[slot],
                                         sems.at[slot])
        row0 = pl.multiple_of(c * block_l, block_l)
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(row0, block_l), :], buf.at[slot],
            sems.at[slot])

    @pl.when(n > 0)
    def _():
        # n_slots-deep DMA pipeline over the visit list.  The measured
        # per-visit cost on a 1.31M-tri mesh's secondary bounces is
        # ~1.7 us at depth 2 (scripts/profile_compact7.py) against ~12 ns
        # of HBM bandwidth per packed tile — i.e. almost pure copy
        # LATENCY: the incoherent-bounce blocks gate most sub-blocks off,
        # leaving too little Moller-Trumbore math for a double buffer to
        # hide the fetch behind.  Keeping n_slots copies in flight
        # amortizes the latency 1/(n_slots-1).  The issue-time slab word
        # for entry j is computed n_slots-1 entries ahead, so it sees the
        # live t as of the last processed tile — STALER than depth 2's
        # one-ahead word, which only weakens the skip (a conservative
        # superset of sub-blocks runs MT); commits stay (t, lowest-gidx)
        # mins, so results are bit-identical at any depth.
        def prefill(k, _):
            w = jax.lax.cond(k < n, lambda: _sub_word(lst[0, k]),
                             lambda: jnp.int32(0))
            wbuf[0, k] = w

            if "nodma" not in _ablate:
                @pl.when(w != 0)
                def _():
                    dma(k, k).start()
            return 0

        jax.lax.fori_loop(0, n_slots - 1, prefill, 0)

        def process(j, _):
            # issue the DMA n_slots-1 ahead; its slot ((j-1) % n_slots)
            # was freed by the previous iteration's wait+MT
            jq = j + n_slots - 1
            w_iss = jax.lax.cond(jq < n,
                                 lambda: _sub_word(lst[0, jq]),
                                 lambda: jnp.int32(0))
            wbuf[0, jq % n_slots] = w_iss

            if "nodma" not in _ablate:
                @pl.when(w_iss != 0)
                def _():
                    dma(jq, jq % n_slots).start()

            prev_word = wbuf[0, j % n_slots]

            @pl.when(prev_word != 0)
            def _():
                if "nodma" not in _ablate:
                    dma(j, j % n_slots).wait()
                if "nowork" in _ablate:
                    return
                raw = buf[j % n_slots]
                plucker = _resolve_plucker(packed, sub_rows)
                if plucker:
                    lts = [_plucker_lt(raw[p * _TROWS:(p + 1) * _TROWS])
                           for p in range(packets)]
                    atiles = ([_tile_transpose(
                        raw[p * _TROWS:(p + 1) * _TROWS])
                        for p in range(packets)]
                        if with_attrs else [None] * packets)
                elif packed:
                    # back to the MT orientation (K tris on sublanes,
                    # attribute columns 0-20) — one MXU transpose per
                    # packet per visited cluster, amortized over every
                    # gated sub-block's Moller-Trumbore below
                    tiles = [_tile_transpose(
                        raw[p * _TROWS:(p + 1) * _TROWS])
                        for p in range(packets)]
                else:
                    tiles = [raw]
                if sub_rows:
                    c = jnp.minimum(lst[0, j], subb.shape[0] // 8 - 1)
                for s in range(n_sub):
                    @pl.when(((prev_word >> s) & 1) > 0)
                    def _(s=s):
                        if plucker:
                            for lt, at in zip(lts, atiles):
                                _mt_update_sub_mxu(lt, rays, t_scr,
                                                   idx_scr, attr_scr,
                                                   t_sub, s, with_attrs,
                                                   at)
                            return
                        for tile in tiles:
                            if sub_rows:
                                _mt_gated_sub(tile, subb, c, s, rays,
                                              t_scr, idx_scr, attr_scr,
                                              t_sub, sox, soy, soz, six,
                                              siy, siz, slive, sub_rows,
                                              n_boxes, with_attrs)
                            else:
                                _mt_update_sub(tile, rays, t_scr, idx_scr,
                                               attr_scr, t_sub, s,
                                               with_attrs)
            return 0

        jax.lax.fori_loop(0, n, process, 0)

    no_win = idx_scr[...] < 0
    t_out = jnp.where(no_win, jnp.float32(jnp.inf), t_scr[...])
    rows = [t_out, pltpu.bitcast(idx_scr[...], jnp.float32)]
    if with_attrs:
        rows.append(attr_scr[...])
    out[...] = jnp.concatenate(rows, axis=0)


def maybe_sub_aabb(clusters):
    """(sub_aabb, sub_div) to pass to intersect_triangles_bvh, honoring
    the SRT_BVH_SUBBOX opt-in: "0"/unset = off, "2"/"4"/"8" = that many
    sub-boxes per cluster ("1" = legacy alias for 8).  The first-cut
    gating (VMEM staging + dynamic-slice fori_loop) measured SLOWER as a
    default on the 82K-tri benchmark (47.4 vs 58.8 Mrays/s on v5e,
    scripts/sweep_config6.py); the static-unroll form is kept opt-in
    until a sweep shows a division that wins."""
    import os
    v = os.environ.get("SRT_BVH_SUBBOX", "0")
    if v == "0" or clusters.sub_aabb is None:
        return None, 8
    if v not in ("1", "2", "4", "8"):
        raise ValueError(f"SRT_BVH_SUBBOX must be 0/1/2/4/8, got {v!r}")
    div = 8 if v == "1" else int(v)
    return clusters.sub_aabb, div


def _union_boxes8(stack: jnp.ndarray) -> jnp.ndarray:
    """Sentinel-aware AABB union over axis -2 of a (..., G, 8) box stack.

    The SINGLE implementation of the convention every culling level
    shares: members with lo >= 1e37 are padding sentinels and must not
    contribute (a sentinel hi of 3e38 would inflate the union to
    [real_lo, 3e38] — an interval every ray slabs as non-empty, the
    exact opposite of padding); an all-sentinel union must come out as
    the far-point sentinel box, never the inverted neutral box (which
    slabs to [0, t_best] for every ray).  Columns 6:8 are zero pad."""
    real = stack[..., 0] < 1.0e37
    lo = jnp.where(real[..., None], stack[..., 0:3], 3.0e38).min(axis=-2)
    hi = jnp.where(real[..., None], stack[..., 3:6], -3.0e38).max(axis=-2)
    empty = hi[..., 0:1] < lo[..., 0:1]
    lo = jnp.where(empty, 3.0e38, lo)
    hi = jnp.where(empty, 3.0e38, hi)
    return jnp.concatenate(
        [lo, hi, jnp.zeros(lo.shape[:-1] + (2,), jnp.float32)], axis=-1)


def coarsen_sub_aabb(sub_aabb: jnp.ndarray, div: int) -> jnp.ndarray:
    """(C*8, 8) sub-box table -> same shape with the 8 slot-range boxes
    per cluster unioned into `div` wider ones (slots 0..div-1; the rest
    become far-point sentinels the slab gates cull).  Box j then bounds
    slot rows [j*K/div, (j+1)*K/div) — the ranges _mt_gated_sub slices."""
    if div == 8:
        return sub_aabb
    g = 8 // div
    boxes = _union_boxes8(sub_aabb.reshape(-1, div, g, 8))   # (C, div, 8)
    pad = jnp.concatenate(
        [jnp.full(boxes.shape[:1] + (8 - div, 6), 3.0e38, jnp.float32),
         jnp.zeros(boxes.shape[:1] + (8 - div, 2), jnp.float32)], axis=-1)
    return jnp.concatenate([boxes, pad], axis=1).reshape(sub_aabb.shape)


# A (slots, 128) f32 table costs 512 B/slot in VMEM;
# tables above this many slots use the HBM/DMA kernel instead of VMEM
# residence (4 MB — leaves room for the (K, BR) compute temporaries).
VMEM_TABLE_MAX_SLOTS = 8192

# The PACKED table (24 rows x 512 B per cluster, see _TROWS) is 5.3x
# denser, so meshes far beyond VMEM_TABLE_MAX_SLOTS still fit VMEM whole:
# 800 clusters = 9.6 MB = ~102K triangles at K=128.  Residence removes
# the per-visit DMA wait entirely — the dominant cost of the
# direction-incoherent secondary bounces, where a block visits many
# clusters but each MT gates down to a few 128-lane sub-blocks, so the
# double-buffered pipeline has too little math to hide the copy latency
# behind (measured on config 6, 82K tris: bounce 2 alone cost 86 ms of
# the 149 ms step on the DMA path).  Same budget reasoning as
# bounce_kernel.MEGA_PACKED_MAX_CLUSTERS.
PACKED_VMEM_MAX_CLUSTERS = int(
    __import__("os").environ.get("SRT_BVH_PACKED_VMEM_MAX", "800"))


def _kernel_packed(visit, count, order, rays, table_v, rays_sub, aabb,
                   sup, subb, out, t_scr, idx_scr, attr_scr, t_sub,
                   *, n_clusters, n_table_clusters, with_attrs,
                   n_sub, two_level, sub_rows, n_boxes, packets):
    """VMEM-resident PACKED-table variant: the full (C, 24, 128) packed
    table rides VMEM for the whole kernel (viewed as (C*24, 128) rows),
    so a visited cluster costs one aligned slice + one exact MXU
    transpose — no DMA, no wait, no SMEM visit list.  Culling structure
    is identical to _kernel_hbm (three levels: XLA prepass gates groups
    or supers per ray block; the kernel refines supers -> children with
    lane-wide slab words against the live best t; each surviving cluster
    is re-slabbed per 128-lane SUB-BLOCK and Moller-Trumbore runs only
    on sub-blocks whose bit is set).  Results are bit-identical to the
    dense path (same _mt_update_sub commit, same cross-cluster
    lowest-global-index tie-break)."""
    b = pl.program_id(0)
    t_scr[...] = rays[7:8, :]
    idx_scr[...] = jnp.full(idx_scr.shape, -1, jnp.int32)
    if with_attrs:
        attr_scr[...] = jnp.zeros(attr_scr.shape, jnp.float32)

    rox = rays[0:1, :]
    roy = rays[1:2, :]
    roz = rays[2:3, :]
    inx = 1.0 / rays[3:4, :]
    iny = 1.0 / rays[4:5, :]
    inz = 1.0 / rays[5:6, :]
    live = rays[6:7, :] > 0.0

    rs = rays_sub[...]
    sb = lambda f: rs[f * n_sub:(f + 1) * n_sub, :]    # (SB, 128)
    sox, soy, soz = sb(0), sb(1), sb(2)
    six = 1.0 / sb(3)
    siy = 1.0 / sb(4)
    siz = 1.0 / sb(5)
    slive = sb(6) > 0.0
    t_sub[...] = sb(7)
    pow2 = (2.0 ** jax.lax.broadcasted_iota(
        jnp.int32, (n_sub, 1), 0).astype(jnp.float32))
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (_SUPER, 1), 0)

    def _sub_word(c):
        """Per-128-lane-sub-block slab word for cluster c under the LIVE
        best t (same math as _kernel_hbm's — see its docstring)."""
        g0 = (c // _SUPER) * _SUPER
        tile = aabb[pl.ds(pl.multiple_of(g0, _SUPER), _SUPER), :]
        onehot = jnp.where(iota16 == c % _SUPER, 1.0, 0.0)
        # (1, 1) VECTOR reductions rather than scalars: the (1, 1)
        # result broadcasts over (SB, 128) purely vector-side, skipping
        # six vector->scalar readouts per visited cluster (measured
        # neutral on config 6, kept as the cheaper form)
        bx = lambda k: jnp.sum(tile[:, k:k + 1] * onehot, keepdims=True)
        t1x = (bx(0) - sox) * six
        t2x = (bx(3) - sox) * six
        t1y = (bx(1) - soy) * siy
        t2y = (bx(4) - soy) * siy
        t1z = (bx(2) - soz) * siz
        t2z = (bx(5) - soz) * siz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.minimum(jnp.maximum(t1z, t2z), t_sub[...]))
        maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & slive
        flags = jnp.max(jnp.where(maybe, 1.0, 0.0), axis=1, keepdims=True)
        return jnp.sum(flags * pow2).astype(jnp.int32)

    def handle_cluster(c):
        """Sub-block gate + MT for one visited cluster, straight from the
        resident table.  `c` is clamped like _kernel_hbm's dma(): a
        NaN-state ray conservatively visits kernel-side two-level padding
        ids that have no table tile; the duplicate visit of a real tile
        is idempotent under the running-min commit."""
        c = jnp.minimum(c, n_table_clusters - 1)
        word = (jnp.int32((1 << n_sub) - 1) if _prof_knob("SRT_BVH_NO_SUBWORD")
                else _sub_word(c))
        if _prof_knob("SRT_BVH_NO_MT"):
            # keep `word` observable so the sub-word slab isn't DCE'd;
            # idx -1 commits are no-ops under the decode contract
            @pl.when(word > (1 << n_sub))
            def _():
                idx_scr[0:1, 0:_SUB] = jnp.full((1, _SUB), -1, jnp.int32)
            return

        @pl.when(word != 0)
        def _():
            # K > 128 clusters span `packets` (24, 128) tiles — each
            # prepared once per visited cluster, MT'd per hit
            # sub-block (a padding packet's active column is all zero,
            # so extra lanes never commit)
            crow = _TROWS * packets
            row0 = pl.multiple_of(c * crow, crow)
            raws = [table_v[pl.ds(row0 + p * _TROWS, _TROWS), :]
                    for p in range(packets)]
            plucker = _resolve_plucker(True, sub_rows)
            if plucker:
                lts = [_plucker_lt(r) for r in raws]
                atiles = ([_tile_transpose(r) for r in raws]
                          if with_attrs else [None] * packets)
            else:
                tiles = [_tile_transpose(r) for r in raws]
            for s in range(n_sub):
                @pl.when(((word >> s) & 1) > 0)
                def _(s=s):
                    if plucker:
                        for lt, at in zip(lts, atiles):
                            _mt_update_sub_mxu(lt, rays, t_scr, idx_scr,
                                               attr_scr, t_sub, s,
                                               with_attrs, at)
                        return
                    for tile in tiles:
                        if sub_rows:
                            _mt_gated_sub(tile, subb, c, s, rays, t_scr,
                                          idx_scr, attr_scr, t_sub, sox,
                                          soy, soz, six, siy, siz, slive,
                                          sub_rows, n_boxes, with_attrs)
                        else:
                            _mt_update_sub(tile, rays, t_scr, idx_scr,
                                           attr_scr, t_sub, s, with_attrs)

    def visit_super(s, n):
        # The (16, BR) child slab looks redundant with _sub_word — per
        # child it costs the same VECTOR lanes as the _sub_word it gates
        # — but it batches 16 children behind ONE scalar extraction,
        # while _sub_word pays ~7 scalar<->vector syncs per cluster
        # (six one-hot box-coord reductions + the word readout).
        # Removing this level was MEASURED SLOWER (50.0 vs 62.3 Mrays/s,
        # config 6 on v5e): the kernel's floor is scalar-sync count per
        # decision, not vector lanes.  Gates must amortize scalar reads,
        # never multiply them.
        tile = aabb[pl.ds(s * _SUPER, _SUPER), :]
        word = _slab_word(tile, rox, roy, roz, inx, iny, inz, live, t_scr)

        def child_bits(nn):
            def bit(i, nn):
                @pl.when(((word >> i) & 1) > 0)
                def _():
                    handle_cluster(s * _SUPER + i)
                return nn
            return jax.lax.fori_loop(0, _SUPER, bit, nn)

        return jax.lax.cond(word != 0, child_bits, lambda nn: nn, n)

    if two_level:
        def visit_group(g, n):
            tile = sup[pl.ds(pl.multiple_of(g * _GROUP, _GROUP), _GROUP),
                       :]
            word = _slab_word(tile, rox, roy, roz, inx, iny, inz, live,
                              t_scr)

            def super_bits(nn):
                def bit(i, nn):
                    return jax.lax.cond(
                        ((word >> i) & 1) > 0,
                        lambda m: visit_super(g * _GROUP + i, m),
                        lambda m: m, nn)
                return jax.lax.fori_loop(0, _GROUP, bit, nn)

            return jax.lax.cond(word != 0, super_bits, lambda nn: nn, n)

        def scan_top(j, n):
            g = order[j]
            bit = (visit[b, g // 32] >> (g % 32)) & 1
            return jax.lax.cond(bit > 0, lambda nn: visit_group(g, nn),
                                lambda nn: nn, n)

        n_top = (n_clusters // _SUPER) // _GROUP
    else:
        def scan_top(j, n):
            s = order[j]
            bit = (visit[b, s // 32] >> (s % 32)) & 1
            return jax.lax.cond(bit > 0, lambda nn: visit_super(s, nn),
                                lambda nn: nn, n)

        n_top = n_clusters // _SUPER

    @pl.when(count[b] > 0)
    def _():
        jax.lax.fori_loop(0, n_top, scan_top, 0)

    no_win = idx_scr[...] < 0
    t_out = jnp.where(no_win, jnp.float32(jnp.inf), t_scr[...])
    rows = [t_out, pltpu.bitcast(idx_scr[...], jnp.float32)]
    if with_attrs:
        rows.append(attr_scr[...])
    out[...] = jnp.concatenate(rows, axis=0)


def _sort_rays_by_super(o, d, alive, t_init, super_aabb, order):
    """Per-ray sort key: the front-to-back RANK of the first supercluster
    the ray's slab interval touches (misses and dead rays sort last).

    Rays are direction-incoherent after the first bounce, so the union
    of clusters a 1536-ray pixel-order block must visit dwarfs what any
    single ray needs (measured on a 131K-tri scene: bounce-1 needs 166K
    ray-cluster pairs but block-granularity packets pay 37K block-cluster
    visits = 3.6G MT lanes, a 340x inflation).  Sorting by first-hit
    super gathers the hitting rays into a few spatially-coherent blocks
    and compacts every all-miss ray into blocks the kernel's count==0
    gate skips outright.  A pure permutation — intersection winners are
    order-independent (global t with index tie-break).

    MEASURED AND REJECTED as a default (scripts/bench_sort_ab.py,
    config 6 at 1080p on v5e): sorted 4.6 Mrays/s vs unsorted 60.9 — the
    sort itself costs ~1.7 s/step because a 2M-element argsort plus ~28
    rows of lane-axis jnp.take (8 ray rows in, 20 result rows out, per
    bounce) lower element-serial on TPU, the exact pattern ops/gather.py
    documents.  The visit savings it buys (~3x fewer block-cluster
    visits on bounce 1) are worth ~50 ms; the permute costs 35x that.
    Kept behind sort_rays=False for regression hunts; a viable revival
    needs the permute itself to be a Pallas DMA kernel, not XLA takes."""
    n_super = super_aabb.shape[0]
    pad = lambda v: v[None]
    inx = 1.0 / pad(d.x)
    iny = 1.0 / pad(d.y)
    inz = 1.0 / pad(d.z)
    col = lambda j: super_aabb[:, j][:, None]
    t1x = (col(0) - pad(o.x)) * inx
    t2x = (col(3) - pad(o.x)) * inx
    t1y = (col(1) - pad(o.y)) * iny
    t2y = (col(4) - pad(o.y)) * iny
    t1z = (col(2) - pad(o.z)) * inz
    t2z = (col(5) - pad(o.z)) * inz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                  jnp.maximum(t1y, t2y)),
                      jnp.minimum(jnp.maximum(t1z, t2z), pad(t_init)))
    maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & (pad(alive) > 0.0)   # (S, R)
    rank = jnp.zeros((n_super,), jnp.int32).at[order].set(
        jnp.arange(n_super, dtype=jnp.int32))
    key = jnp.min(jnp.where(maybe, rank[:, None], n_super), axis=0)
    return jnp.argsort(key)


@functools.partial(jax.jit,
                   static_argnames=("block_r", "interpret", "with_attrs",
                                    "hbm_table", "sort_rays",
                                    "prepass_level", "packed_vmem",
                                    "sub_div"))
def intersect_triangles_bvh(o: Vec3, d: Vec3, alive: jnp.ndarray,
                            t_init: jnp.ndarray, aabb: jnp.ndarray,
                            table_t: jnp.ndarray, block_r: int = 1536,
                            interpret: bool = False,
                            with_attrs: bool = False,
                            hbm_table: Optional[bool] = None,
                            sort_rays: Optional[bool] = None,
                            table_tr: Optional[jnp.ndarray] = None,
                            prepass_level: str = "group",
                            packed_vmem: Optional[bool] = None,
                            sub_aabb: Optional[jnp.ndarray] = None,
                            sub_div: int = 8):
    """(R,) rays x clustered triangles -> nearest-hit per ray.

    `alive`: (R,) f32 mask — dead rays generate no cluster visits.
    `t_init`: (R,) f32 — current best t from other primitive types; the
    kernel only reports triangle hits strictly closer than this.
    `aabb`: (C, 8) f32, `table_t`: (C*K, 128) f32 from the scene build.
    `hbm_table` selects where the table lives during the kernel: False =
    VMEM-resident (small/mid meshes), True = HBM with double-buffered
    per-visit DMA; None picks by size (VMEM_TABLE_MAX_SLOTS).
    `table_tr`: optional (C, 24, 128) packed transposed table — when
    given, the HBM path streams 96 B/triangle tiles instead of 512
    (see _TROWS); ignored by the VMEM path.
    `prepass_level`: "group" (default; measured faster at 82K tris —
    58.8 vs 54.4 Mrays/s on v5e) gates GROUPS of _GROUP supers in the
    XLA prepass (~15x cheaper than per-super) and refines groups ->
    supers inside the kernel; "super" gates superclusters directly.
    Both are result-identical; HBM and packed-VMEM paths only.
    `packed_vmem`: keep the PACKED table (table_tr) VMEM-resident for
    the whole kernel — no per-visit DMA (see PACKED_VMEM_MAX_CLUSTERS).
    None picks it automatically for tables too big for row-VMEM
    residence but small enough packed; requires table_tr.
    `sub_aabb`: optional (C*8, 8) per-cluster sub-box table
    (TriangleClustersSoA.sub_aabb).  When given (and K % (8*sub_div)
    == 0), the streaming/packed kernels add a fourth culling level:
    Moller-Trumbore runs per hit (K/sub_div, 128) sub-tile instead of
    the whole (K, 128) tile — result-identical.  `sub_div` in (2, 4, 8)
    picks the granularity (8 uses the build's boxes directly; 2/4 union
    them via coarsen_sub_aabb).  Opt-in via maybe_sub_aabb — the gating
    measured slower than plain MT as a default on v5e.
    Returns (t_best (R,), idx_best (R,) i32) with idx == -1 and t == +inf
    where no triangle won; with_attrs=True additionally returns the
    winner's (19, R) shading attributes [v0, e1, e2, n0, n1, n2, mat]."""
    n_rays = o.x.shape[0]
    n_clusters = aabb.shape[0]
    block_l = table_t.shape[0] // max(n_clusters, 1)
    n_out = 2 + (_N_ATTRS if with_attrs else 0)
    # packets = ceil(K/128) (24, 128) tiles per cluster in table_tr;
    # the VMEM-residence budget counts TILES, not clusters, so a K=256
    # table competes for the same 9.6 MB as a K=128 one
    packets = (table_tr.shape[1] // _TROWS) if table_tr is not None else 1
    if packed_vmem is None:
        packed_vmem = (hbm_table is not True
                       and table_t.shape[0] > VMEM_TABLE_MAX_SLOTS
                       and table_tr is not None
                       and table_tr.shape[0] * packets
                       <= PACKED_VMEM_MAX_CLUSTERS)
    if packed_vmem:
        if table_tr is None:
            raise ValueError("packed_vmem=True requires table_tr")
        hbm_table = False
    elif hbm_table is None:
        hbm_table = table_t.shape[0] > VMEM_TABLE_MAX_SLOTS
    if sort_rays is None:
        sort_rays = False   # measured 13x SLOWER when on — see docstring

    # Mosaic charges ~0.5 KB of scoped SMEM per grid step and v5e SMEM is
    # 1 MB, so one call is capped at ~1600 blocks; larger ray batches run
    # as a few sequential calls (unrolled here — shapes stay static).
    max_blocks = 1600
    if (n_rays + block_r - 1) // block_r > max_blocks:
        chunk = max_blocks * block_r
        parts = []
        for s in range(0, n_rays, chunk):
            e = min(s + chunk, n_rays)
            sl = slice(s, e)
            parts.append(intersect_triangles_bvh(
                Vec3(o.x[sl], o.y[sl], o.z[sl]),
                Vec3(d.x[sl], d.y[sl], d.z[sl]),
                alive[sl], t_init[sl], aabb, table_t,
                block_r=block_r, interpret=interpret,
                with_attrs=with_attrs, hbm_table=hbm_table,
                sort_rays=sort_rays, table_tr=table_tr,
                prepass_level=prepass_level, packed_vmem=packed_vmem,
                sub_aabb=sub_aabb, sub_div=sub_div))
        return tuple(jnp.concatenate([p[i] for p in parts], axis=-1)
                     for i in range(len(parts[0])))

    def front_to_back(boxes8):
        """Global cluster order: ascending box-center distance from the
        mean live-ray origin.  Pure heuristic — any permutation gives
        identical results; a good one lets the live-t re-slab gate skip
        most far tiles."""
        w = alive
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        origin = jnp.stack([jnp.sum(o.x * w), jnp.sum(o.y * w),
                            jnp.sum(o.z * w)]) / wsum
        centers = (boxes8[:, 0:3] + boxes8[:, 3:6]) * 0.5
        d2 = jnp.sum((centers - origin[None, :]) ** 2, axis=1)
        import os
        if os.environ.get("SRT_BVH_ORDER") == "rev":
            # debug knob: WORST-case order, to measure how much the
            # live-t ordering actually buys (sweep_config6 A/B)
            d2 = -d2
        return jnp.argsort(d2).astype(jnp.int32)

    two_level = (hbm_table or packed_vmem) and prepass_level == "group"
    super_aabb = top_aabb = order = None
    if hbm_table or packed_vmem:
        # Pad the cluster list to a _SUPER (or _SUPER*_GROUP) multiple
        # with far-point sentinel boxes (every plane at +3e38 — culled
        # by the slab gates' near >= 1e38 term, see _visit_prepass) and
        # bound each group of _SUPER children; two-level additionally
        # bounds each group of _GROUP supers for the coarser prepass.
        quantum = _SUPER * _GROUP if two_level else _SUPER
        c_pad = ((n_clusters + quantum - 1) // quantum) * quantum
        sent = jnp.full((c_pad - n_clusters, 8), 3.0e38, jnp.float32
                        ).at[:, 6:].set(0.0)
        aabb_pad = jnp.concatenate([aabb, sent]) if c_pad > n_clusters \
            else aabb
        # a child is REAL when it is in range AND not one of the scene
        # build's own bucket-padding sentinels (lo = 3e38 rows inside
        # `aabb` itself).  Including sentinel hi's (= 3e38) would inflate
        # the union box to [real_lo, 3e38]: a slab interval that is
        # non-empty for EVERY live ray, which defeats both the prepass
        # cull and the kernel's empty-block skip on any padded scene.
        # the sentinel-aware union (_union_boxes8) treats lo >= 1e37
        # members as padding; the appended pad rows and the scene build's
        # own bucket sentinels both satisfy it, so no index mask is
        # needed on top
        super_aabb = _union_boxes8(aabb_pad.reshape(-1, _SUPER, 8))
        if two_level:
            top_aabb = _union_boxes8(super_aabb.reshape(-1, _GROUP, 8))
        else:
            top_aabb = super_aabb
        order = front_to_back(top_aabb)

    inv_perm = None
    if sort_rays and hbm_table:
        perm = _sort_rays_by_super(o, d, alive, t_init, super_aabb,
                                   front_to_back(super_aabb))
        inv_perm = jnp.zeros((n_rays,), jnp.int32).at[perm].set(
            jnp.arange(n_rays, dtype=jnp.int32))
        take = lambda v: jnp.take(v, perm, axis=0)
        o = Vec3(take(o.x), take(o.y), take(o.z))
        d = Vec3(take(d.x), take(d.y), take(d.z))
        alive = take(alive)
        t_init = take(t_init)

    pad_r = (-n_rays) % block_r

    def row(c, fill=0.0):
        return jnp.pad(c, (0, pad_r), constant_values=fill)

    rays = jnp.stack([row(o.x), row(o.y), row(o.z), row(d.x), row(d.y),
                      row(d.z), row(alive), row(t_init)], axis=0)

    rp = n_rays + pad_r
    grid = (rp // block_r,)

    scratch = [
        pltpu.VMEM((1, block_r), jnp.float32),
        pltpu.VMEM((1, block_r), jnp.int32),
        pltpu.VMEM((_N_ATTRS if with_attrs else 1, block_r), jnp.float32),
    ]
    if hbm_table or packed_vmem:
        # Streaming/packed paths: the XLA prepass gates SUPERCLUSTERS
        # (groups of _SUPER, boxes built above) or GROUPS of supers; the
        # kernel refines to children.  c_pad / aabb_pad carry over from
        # the super-box construction above (same quantum, sentinels).
        visits, counts = _visit_prepass(o, d, alive, t_init, top_aabb,
                                        block_r, pad_r)
        n_sub = block_r // _SUB
        # (field * SB + s, 128) transposed ray layout for the per-sub-
        # block slab words (fields: o.xyz, d.xyz, alive, t_init)
        rays_sub = (rays.reshape(8, rp // block_r, n_sub, _SUB)
                    .transpose(0, 2, 1, 3).reshape(8 * n_sub, -1))
        # the kernel reads `sup` only under two_level (its group->super
        # refine); stage a tiny dummy otherwise instead of paying the
        # full super table's VMEM residency + per-call DMA for nothing
        sup_in = super_aabb if two_level else super_aabb[:8]
        extra_in = [rays_sub, aabb_pad, sup_in]
        common_specs = [
            pl.BlockSpec((8 * n_sub, _SUB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),     # sub-layout rays
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0),    # child boxes
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sup_in.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # super boxes
        ]
        # fourth culling level: per-cluster sub-boxes (see _mt_gated_sub).
        # sub_rows = 0 disables it (no sub_aabb; slices not 8-aligned —
        # MT sub-tile row offsets must stay sublane-multiple-of-8; or a
        # multi-packet table, whose sub-ranges would span packet tiles)
        sub_rows = (block_l // sub_div if sub_aabb is not None
                    and block_l % (8 * sub_div) == 0
                    and packets == 1 else 0)
        if sub_rows and sub_div != 8:
            sub_aabb = coarsen_sub_aabb(sub_aabb, sub_div)
        subb_in = (sub_aabb if sub_rows
                   else jnp.zeros((8, 8), jnp.float32))
        common_specs.append(pl.BlockSpec(
            (subb_in.shape[0], 8), lambda i: (0, 0),
            memory_space=pltpu.VMEM))                  # sub-boxes
        scratch += [
            pltpu.VMEM((n_sub, _SUB), jnp.float32),    # live t, sub layout
        ]
        if packed_vmem:
            # whole packed table resident in VMEM, viewed as 2-D rows
            table_op = table_tr.reshape(-1, 128)
            kernel = functools.partial(
                _kernel_packed, n_clusters=c_pad,
                n_table_clusters=table_tr.shape[0],
                with_attrs=with_attrs, n_sub=n_sub, two_level=two_level,
                sub_rows=sub_rows, n_boxes=sub_div, packets=packets)
            extra_specs = [
                pl.BlockSpec((table_op.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + common_specs
        else:
            packed = table_tr is not None
            table_op = table_tr if packed else table_t
            n_slots = _resolve_dma_slots()
            kernel = functools.partial(_kernel_hbm, block_l=block_l,
                                       n_clusters=c_pad,
                                       with_attrs=with_attrs, n_sub=n_sub,
                                       packed=packed, two_level=two_level,
                                       sub_rows=sub_rows, n_boxes=sub_div,
                                       packets=packets, n_slots=n_slots)
            extra_specs = [
                pl.BlockSpec(memory_space=pl.ANY),     # table in HBM
            ] + common_specs
            scratch += [
                pltpu.SMEM((1, c_pad), jnp.int32),        # visit list
                pltpu.VMEM((n_slots, _TROWS * packets, 128) if packed
                           else (n_slots, block_l, table_t.shape[1]),
                           jnp.float32),               # DMA pipeline ring
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SMEM((1, n_slots), jnp.int32),   # issue-word ring
            ]
        extra_in.append(subb_in)
    else:
        table_op = table_t
        visits, counts = _visit_prepass(o, d, alive, t_init, aabb,
                                        block_r, pad_r)
        order = front_to_back(aabb)
        kernel = functools.partial(_kernel, block_l=block_l,
                                   n_clusters=n_clusters,
                                   with_attrs=with_attrs)
        # reslab slices aligned groups of 8 boxes: pad with far-point
        # sentinels (culled by the near >= 1e38 gate term, see above)
        c8 = ((n_clusters + 7) // 8) * 8
        aabb8 = (jnp.concatenate(
            [aabb, jnp.full((c8 - n_clusters, 8), 3.0e38, jnp.float32)])
            if c8 > n_clusters else aabb)
        extra_in = [aabb8]
        # whole triangle table resident in VMEM for every block
        extra_specs = [
            pl.BlockSpec((table_t.shape[0], table_t.shape[1]),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c8, 8), lambda i: (0, 0),       # boxes for reslab
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # traversal order
            pl.BlockSpec((8, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((n_out, block_r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, rp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(visits, counts, order, rays, table_op, *extra_in)

    res = out[:, :n_rays]
    if inv_perm is not None:
        # Undo the coherence sort: results return in caller ray order.
        # Gather as int32 bits — row 1 is an int32 index bitcast into the
        # f32 output (idx -1 = 0xFFFFFFFF, a NaN payload that a float
        # gather would canonicalize to 0x7FC00000 and destroy).
        bits = jax.lax.bitcast_convert_type(res, jnp.int32)
        res = jax.lax.bitcast_convert_type(
            jnp.take(bits, inv_perm, axis=1), jnp.float32)
    t_best = res[0]
    idx = jax.lax.bitcast_convert_type(res[1], jnp.int32)
    if with_attrs:
        return t_best, idx, res[2:]
    return t_best, idx


def compact_cap_auto(n_rays: int, block_r: int = 1536) -> Optional[int]:
    """Default capacity for intersect_triangles_bvh_compact: 1/20 of the
    ray count, rounded up to a block multiple, floored at 16 blocks.

    Sized from the measured admission profile of the 82K-triangle bench
    scene at 1080p (scripts/measure_compact.py): rays admitting >= 1
    supercluster peak at ~80K of 2.07M (~3.9%) across all four bounces.
    The cap sweep (scripts/bench_compact.py, v5e, peeled policy) makes
    1/20 the sweet spot: 98,304 = 107.2 Mrays/s, 110,592 = 106.3,
    130,560 (1/16) = 102.9, while 76,800 sits BELOW the bounce-1
    admission peak and collapses to the dense fallback (79.1) — so 1/20
    (104,448 at 1080p, ~1.3x the measured peak) keeps headroom against
    viewpoint drift and overflow degrades gracefully to dense-correct.
    Returns None (compaction off) below 64 blocks, where the dense
    kernel is already cheap and the sort/gather overhead is pure loss."""
    if n_rays < 64 * block_r:
        return None
    blocks = -(-n_rays // (20 * block_r))
    return max(blocks, 16) * block_r


def table_streams_hbm(clusters) -> bool:
    """True when intersect_triangles_bvh's auto residency would STREAM
    this cluster table from HBM (per-visit DMA) rather than hold it
    VMEM-resident (row or packed form) — the regime where even coherent
    camera rays pay per-visit copy costs, which flips the bounce-0
    compaction policy in trace_rays (config 7's camera rays admit ~3%
    of the grid, so the compacted kernel touches ~5% of the rays the
    dense peel would)."""
    if clusters is None:
        return False
    if clusters.table_t.shape[0] <= VMEM_TABLE_MAX_SLOTS:
        return False
    if clusters.table_tr is None:
        return True
    packets = clusters.table_tr.shape[1] // _TROWS
    return (clusters.table_tr.shape[0] * packets
            > PACKED_VMEM_MAX_CLUSTERS)


def _resolve_dma_slots() -> int:
    """Depth of the HBM streaming kernel's DMA pipeline (number of
    in-flight cluster-tile copies).  Default 8: the per-visit cost of
    incoherent secondary bounces is almost pure copy latency (~1.7 us
    at depth 2 vs ~12 ns of bandwidth per packed tile,
    scripts/profile_compact7.py on the 1.31M-tri config 7), so depth
    amortizes it nearly linearly until the issue-time slab word's
    staleness starts re-admitting sub-blocks.  VMEM cost is
    slots x 12 KB per packet.  SRT_BVH_DMA_SLOTS overrides for sweeps;
    results are bit-identical at any depth >= 2."""
    import os
    v = int(os.environ.get("SRT_BVH_DMA_SLOTS", "8"))
    if v < 2:
        raise ValueError(f"SRT_BVH_DMA_SLOTS must be >= 2, got {v}")
    return v


def _resolve_sort_key(sort_key, aabb, table_t, table_tr, hbm_table,
                      packed_vmem, bucket_bits: int) -> str:
    """Compaction sort-key policy: "super" (first-admitted-super rank —
    round 4's key) or "morton" (origin Morton cell).  None = auto =
    "super": measured better in BOTH table-residency regimes — on the
    VMEM-resident config 6 by the round-4 sweep (scripts/
    bench_compact.py), and on the HBM-streamed 1.31M-tri config 7 by
    scripts/profile_compact7.py (real bounce-1 rays: 63K total cluster
    visits and 110 ms vs Morton's 87K and 137 ms — the first-admitted-
    box key groups rays by where their TRAVERSAL starts, which predicts
    the visit set better than where the rays originate, and its bucket
    order is front-to-back so the live-t gate skips more).  "morton"
    stays available for sweeps (SRT_BVH_COMPACT_KEY or the sort_key
    arg); it falls back to "super" when fewer than 6 bucket bits remain
    (a 3-bit Morton cell cannot beat 44 supers).  The residency args
    are accepted so a future residency-dependent policy keeps this
    signature."""
    import os
    del table_t, table_tr, hbm_table, packed_vmem, aabb  # see docstring
    env = os.environ.get("SRT_BVH_COMPACT_KEY")
    if env:
        if env not in ("super", "morton", "auto"):
            raise ValueError(
                f"SRT_BVH_COMPACT_KEY must be super/morton/auto: {env!r}")
        sort_key = None if env == "auto" else env
    if sort_key is None:
        sort_key = "super"
    if sort_key == "morton" and bucket_bits < 6:
        sort_key = "super"
    return sort_key


def _admission_boxes(aabb: jnp.ndarray) -> jnp.ndarray:
    """Supercluster boxes for the compact wrapper's admission test:
    the kernel entry's own sentinel-aware _SUPER-way unions, further
    unioned in _SUPER groups until at most 256 boxes remain.  The
    admission slab matrix is (S, R), and a 1.3M-tri mesh (config 7) has
    700+ superclusters — coarsening keeps the prepass ~2 ms at 1080p.
    CONSERVATIVE by construction: a union contains its members, so no
    ray that could reach a triangle is ever rejected; only the
    front-to-back rank gets coarser."""
    n_clusters = aabb.shape[0]
    c_pad = ((n_clusters + _SUPER - 1) // _SUPER) * _SUPER
    if c_pad > n_clusters:
        sent = jnp.full((c_pad - n_clusters, 8), 3.0e38,
                        jnp.float32).at[:, 6:].set(0.0)
        aabb = jnp.concatenate([aabb, sent])
    boxes = _union_boxes8(aabb.reshape(-1, _SUPER, 8))
    while boxes.shape[0] > 256:
        s_pad = (-boxes.shape[0]) % _SUPER
        if s_pad:
            sent8 = jnp.full((s_pad, 8), 3.0e38,
                             jnp.float32).at[:, 6:].set(0.0)
            boxes = jnp.concatenate([boxes, sent8])
        boxes = _union_boxes8(boxes.reshape(-1, _SUPER, 8))
    return boxes


def _compact_prefix(o: Vec3, d: Vec3, alive: jnp.ndarray,
                    t_init: jnp.ndarray, aabb: jnp.ndarray, cap: int,
                    key_kind: str):
    """The compact wrapper's XLA front half: admission against the
    coarsened supercluster boxes + ONE single-operand coherence sort.
    Returns (prefix (cap,) i32 ray indices — admitting rays first in
    coherence-key order, padded with non-admitting rays — and the
    admitting-ray count that gates the wrapper's lax.cond).

    Sorting one packed (bucket << idx_bits | index) array measures 2.5x
    cheaper than sort_key_val at 2M rays (scripts/bench_compact_parts.py)
    and the in-key index makes the order stable (pixel-tile coherence
    inside each bucket) for free.  The bucket field gets whatever bits
    the ray index leaves free; keys beyond its clamp share the last real
    bucket (coherence loss only, never correctness).

    key_kind "super": front-to-back rank of the first admitted
    supercluster + direction octant (round 4's key).  "morton": origin
    Morton cell + octant — secondary rays originate ON geometry, so
    quantizing origins over the mesh bounds packs each kernel ray block
    into a tight spatial cell (the 44 coarse admission boxes of a
    1.31M-tri sculpt each span ~256 clusters; a Morton cell spans a
    handful).  Both are pure coherence heuristics: any permutation is
    result-identical (commits are (t, lowest-gidx) mins and the scatter
    goes through `prefix`)."""
    n_rays = o.x.shape[0]
    super_aabb = _admission_boxes(aabb)
    n_super = super_aabb.shape[0]

    # -- front-to-back rank of each super (same heuristic as `order`) --
    w = alive
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    origin = jnp.stack([jnp.sum(o.x * w), jnp.sum(o.y * w),
                        jnp.sum(o.z * w)]) / wsum
    centers = (super_aabb[:, 0:3] + super_aabb[:, 3:6]) * 0.5
    d2 = jnp.sum((centers - origin[None, :]) ** 2, axis=1)
    rank = jnp.zeros((n_super,), jnp.int32).at[jnp.argsort(d2)].set(
        jnp.arange(n_super, dtype=jnp.int32))

    # -- per-ray admission + first-admitted-super rank, (S, R) --------
    ox, oy, oz = o.x[None], o.y[None], o.z[None]
    inx, iny, inz = 1.0 / d.x[None], 1.0 / d.y[None], 1.0 / d.z[None]
    live = (alive > 0.0)[None]
    col = lambda j: super_aabb[:, j][:, None]
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
                      jnp.minimum(jnp.maximum(t1z, t2z), t_init[None]))
    maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live
    first = jnp.min(jnp.where(maybe, rank[:, None], n_super), axis=0)
    count = jnp.sum(first < n_super, dtype=jnp.int32)

    idx_bits = max((n_rays - 1).bit_length(), 1)
    bucket_bits = 31 - idx_bits
    n_buckets = 1 << bucket_bits           # last bucket = non-admitting
    octant = ((d.x < 0) * 4 + (d.y < 0) * 2 + (d.z < 0)).astype(jnp.int32)
    if key_kind == "morton":
        mb = bucket_bits - 3                       # bits left for space
        nbits = [(mb + 2) // 3, (mb + 1) // 3, mb // 3]  # per axis x,y,z
        real = super_aabb[:, 0] < 1.0e37
        lo = jnp.min(jnp.where(real[:, None], super_aabb[:, 0:3],
                               3.0e38), axis=0)
        hi = jnp.max(jnp.where(real[:, None], super_aabb[:, 3:6],
                               -3.0e38), axis=0)
        span = jnp.maximum(hi - lo, 1.0e-20)

        def quant(v, axis, bits):
            cells = jnp.float32(1 << bits)
            q = ((v - lo[axis]) / span[axis] * cells).astype(jnp.int32)
            return jnp.clip(q, 0, (1 << bits) - 1)

        qs = [quant(o.x, 0, nbits[0]), quant(o.y, 1, nbits[1]),
              quant(o.z, 2, nbits[2])]
        morton = jnp.zeros_like(octant)
        out_pos = mb
        for level in range(max(nbits)):            # interleave MSB-first
            for a in range(3):
                if level < nbits[a]:
                    out_pos -= 1
                    bit = (qs[a] >> (nbits[a] - 1 - level)) & 1
                    morton = morton | (bit << out_pos)
        bucket = jnp.minimum(morton * 8 + octant, n_buckets - 2)
    else:
        bucket = jnp.minimum(first * 8 + octant, n_buckets - 2)
    bucket = jnp.where(first < n_super, bucket, n_buckets - 1)
    iota = jnp.arange(n_rays, dtype=jnp.int32)
    packed_key = jnp.left_shift(bucket, idx_bits) | iota
    (skey,) = jax.lax.sort((packed_key,))
    prefix = jax.lax.slice_in_dim(skey, 0, cap) & ((1 << idx_bits) - 1)
    return prefix, count


def intersect_triangles_bvh_compact(
        o: Vec3, d: Vec3, alive: jnp.ndarray, t_init: jnp.ndarray,
        aabb: jnp.ndarray, table_t: jnp.ndarray, cap: int,
        block_r: int = 1536, interpret: bool = False,
        with_attrs: bool = False, hbm_table: Optional[bool] = None,
        table_tr: Optional[jnp.ndarray] = None,
        prepass_level: str = "group",
        packed_vmem: Optional[bool] = None,
        sub_aabb: Optional[jnp.ndarray] = None, sub_div: int = 8,
        shaded: bool = False, sort_key: Optional[str] = None):
    """intersect_triangles_bvh behind a ray compaction: only rays that
    can possibly intersect the mesh enter the kernel, densely packed.

    Secondary bounces of a mesh scene are SPARSE: at 1080p/4 bounces on
    the 82K-triangle bench scene, at most ~4% of rays admit any
    supercluster per bounce, yet the dense kernel's 128-lane MT
    sub-blocks run whenever ANY of their rays admits a cluster —
    measured 2.8-9% MT lane occupancy (scripts/measure_compact.py,
    scripts/measure_admission.py), i.e. ~90 of a 133 ms step multiplying
    mostly-dead lanes.  This wrapper:

      1. slab-tests every ray against the SUPERCLUSTER boxes (the same
         sentinel-aware _union_boxes8 boxes and _visit_prepass slab
         semantics the kernel itself gates with) as fused XLA in (S, R)
         orientation — ~0.2 ms at 1080p,
      2. sorts ray indices by (front-to-back rank of the first admitted
         supercluster, direction octant) with non-admitting rays keyed
         last — one stable u32 key+value sort, ~3.7 ms at 2M rays; the
         stable sort preserves pixel-tile coherence inside each bucket,
      3. runs the normal kernel on the first `cap` rays of that order
         (a static shape: ceil-padded with the non-admitting tail,
         whose rays the kernel simply reports as misses),
      4. scatters results back to ray order.  shaded=False returns the
         kernel's own (t, idx[, attrs]) via one row-packed i32 scatter
         (bitcast — a float scatter would canonicalize the idx = -1 NaN
         payload).  shaded=True (the production form, closest_hit's
         compact route) first evaluates the triangle-shading tail
         (barycentric smooth normal + material, render.cl:339-343) IN
         COMPACT SPACE and scatters only five 1-D lanes
         (t, nx, ny, nz, material) — the 19 attr rows never travel,
         which is the difference between a ~16 ms and ~4 ms return trip
         at 1080p.  Returns (t, normal Vec3, material f32), with
         non-winners at (inf, 0, 0).

    When more than `cap` rays admit (e.g. the camera parked inside the
    mesh), a lax.cond falls back to the dense kernel on all rays —
    results stay correct for every scene/viewpoint, compaction is purely
    a fast path.  Results are bit-identical to the dense kernel FOR LIVE
    RAYS: the per-ray math is lane-independent, commits are (t,
    lowest-gidx) mins (visit-order independent), and the admission test
    is conservative — a ray it rejects can hit no triangle strictly
    inside its slab interval (triangle subset of cluster box subset of
    super box, far bound capped by the SAME t_init the kernel seeds
    t_scr with).  DEAD rays differ harmlessly: the dense kernel lets
    them report coincidental hits (they ride along in the MT lanes of
    blocks their live neighbors open), the compact path reports misses;
    every caller masks dead lanes (trace_rays: h_alive = alive &
    hit.hit), so rendered output is identical.

    The reference pays the same sparsity linearly per ray inside its
    per-pixel loop (render.cl:316-331 skips whole models by AABB); a
    lane-SIMD machine needs the compaction to reach the same effect.
    """
    n_rays = o.x.shape[0]
    if cap >= n_rays or 31 - max((n_rays - 1).bit_length(), 1) < 4:
        # no headroom to compact (or no key bits left beside the ray
        # index — rays beyond ~134M): plain dense call
        res = intersect_triangles_bvh(
            o, d, alive, t_init, aabb, table_t, block_r=block_r,
            interpret=interpret, with_attrs=with_attrs or shaded,
            hbm_table=hbm_table, table_tr=table_tr,
            prepass_level=prepass_level, packed_vmem=packed_vmem,
            sub_aabb=sub_aabb, sub_div=sub_div)
        if not shaded:
            return res
        lanes = _compact_shade(o, d, res[0], res[1], res[2])
        return (res[0], Vec3(lanes[0], lanes[1], lanes[2]), lanes[3])

    key_kind = _resolve_sort_key(
        sort_key, aabb, table_t, table_tr, hbm_table, packed_vmem,
        31 - max((n_rays - 1).bit_length(), 1))
    prefix, count = _compact_prefix(o, d, alive, t_init, aabb, cap,
                                    key_kind)

    kw = dict(block_r=block_r, interpret=interpret,
              with_attrs=with_attrs or shaded,
              hbm_table=hbm_table, table_tr=table_tr,
              prepass_level=prepass_level, packed_vmem=packed_vmem,
              sub_aabb=sub_aabb, sub_div=sub_div)
    n_out = 2 + (_N_ATTRS if kw["with_attrs"] else 0)

    def compacted(_):
        packed = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, alive, t_init],
                           axis=1)                        # (R, 8) rows
        rows = jnp.take(packed, prefix, axis=0).T         # (8, cap)
        ro = Vec3(rows[0], rows[1], rows[2])
        rd = Vec3(rows[3], rows[4], rows[5])
        res = intersect_triangles_bvh(ro, rd, rows[6], rows[7], aabb,
                                      table_t, **kw)
        bc = jax.lax.bitcast_convert_type
        if shaded:
            # t scatters with a +inf miss fill; nx/ny/nz/mat with 0 —
            # five 1-D lane scatters beat any (R, k) row scatter, whose
            # minor dim pads to 128 lanes (16x traffic inflation)
            lanes = _compact_shade(ro, rd, res[0], res[1], res[2])
            t = jnp.full((n_rays,), jnp.inf, jnp.float32).at[prefix].set(
                res[0], unique_indices=True)
            outs = [jnp.zeros((n_rays,), jnp.float32).at[prefix].set(
                v, unique_indices=True) for v in lanes]
            return (t, Vec3(outs[0], outs[1], outs[2]), outs[3])
        parts = [bc(res[0], jnp.int32)[None], res[1][None]]
        if kw["with_attrs"]:
            parts.append(bc(res[2], jnp.int32))
        pack_c = jnp.concatenate(parts, axis=0).T         # (cap, n_out)
        miss = jnp.asarray(
            [np.float32(np.inf).view(np.int32), -1] + [0] * (n_out - 2),
            jnp.int32)
        full = jnp.broadcast_to(miss[None], (n_rays, n_out)).at[
            prefix].set(pack_c, unique_indices=True).T    # (n_out, R)
        t = bc(full[0], jnp.float32)
        if kw["with_attrs"]:
            return t, full[1], bc(full[2:], jnp.float32)
        return t, full[1]

    def dense(_):
        res = intersect_triangles_bvh(o, d, alive, t_init, aabb,
                                      table_t, **kw)
        if shaded:
            lanes = _compact_shade(o, d, res[0], res[1], res[2])
            return (res[0], Vec3(lanes[0], lanes[1], lanes[2]), lanes[3])
        return res

    return jax.lax.cond(count <= cap, compacted, dense, None)


def _compact_shade(ro: Vec3, rd: Vec3, t_c, i_c, attrs):
    """The triangle-shading tail of closest_hit (barycentric smooth
    normal + material, render.cl:339-343), evaluated right where the
    winner attributes already are — in COMPACT space — so only 4 small
    lanes travel back to ray order instead of 19 attr rows.
    Elementwise per ray, so values for winning rays are bit-identical
    to the dense full-R evaluation; non-winners are sanitized to 0
    (their dense counterparts are garbage both ways — closest_hit
    selects them out)."""
    from ..intersect import barycentric_weights_from_edges
    from ..vec import normalize as vnormalize
    pos = ro + rd * t_c
    tv0 = Vec3(attrs[0], attrs[1], attrs[2])
    ea = Vec3(attrs[3], attrs[4], attrs[5])
    eb = Vec3(attrs[6], attrs[7], attrs[8])
    wx, wy, wz = barycentric_weights_from_edges(ea, eb, pos - tv0)
    n = (Vec3(attrs[9], attrs[10], attrs[11]) * wx
         + Vec3(attrs[12], attrs[13], attrs[14]) * wy
         + Vec3(attrs[15], attrs[16], attrs[17]) * wz)
    n = vnormalize(n)
    win = i_c >= 0
    zero = jnp.zeros_like(t_c)
    clean = lambda v: jnp.where(win, v, zero)
    return (clean(n.x), clean(n.y), clean(n.z), clean(attrs[18]))
