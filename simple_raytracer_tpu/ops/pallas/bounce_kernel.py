"""Fused wavefront Pallas kernels: the whole-trace megakernel and the
per-bounce shade kernel.

**The whole-trace megakernel** (``_trace_kernel`` / ``trace_full_fused``)
is the production render path on TPU: one Pallas call per progressive
pass does EVERYTHING —

  - ray generation in-kernel (pixel ids reconstructed from the grid
    index, inverting the ray-tile permutation with integer ops; camera,
    time and shard row-offset arrive as traced SMEM scalars, so nothing
    recompiles on motion),
  - the full bounce loop with the 20-row transposed ray state resident
    in VMEM (bounce 0 and the last bounce unrolled, the middle as a
    while_loop that EXITS as soon as the block has no live ray — the
    final bounce statically skips its dead BSDF sample),
  - dense sphere/plane intersection, small meshes (<= SMALL_TRIS_MAX)
    as an in-kernel (T, BR) Moller-Trumbore, and clustered meshes with
    VMEM-resident tables as an in-kernel BVH traversal: front-to-back
    GROUP scan, one slab word per 8 cluster AABBs against the live best
    t, gated MT with the smooth normal interpolated from MT's (u, v),
  - the analytic gradient environment on the deferred-miss rows,

and writes back only the radiance rows.  The equivalent dense-XLA scan
(ops/trace.py) remains the portable reference path (CPU, goldens,
texture skyboxes sample there on the returned miss rows).

**The per-bounce kernel** (``_bounce_kernel`` / ``bounce_step``) serves
meshes too large for VMEM residence: it interleaves with the HBM/DMA
BVH kernel each bounce, carrying the same 20-row state through a scan
and skipping dead blocks.

Parity with the XLA path is maintained at the SOURCE level: the kernel
bodies call the same ``rng`` / ``bsdf.sample_material`` / ``vec`` /
``sky`` functions on (1, BR) rows (bit-identical on TPU up to
float-associativity differences of XLA fusion, measured <= 5e-5 at
1080p; pure-diffuse scenes are exactly bit-identical).

State rows (rays on lanes, fields on sublanes — (R, F) layouts lane-pad
16x and re-scan per consumed field):

    0-2  origin xyz          8-10  path throughput (mask)
    3-5  direction xyz      11-13  accumulated color
    6    RNG seed (u32 bits 14-16  deferred-sky throughput
         viewed as f32)     17-19  deferred-sky direction
    7    alive flag (0/1)

Reference mapping: render.cl:396-523 (``trace`` + ``__kernel render``),
with the same masked-update semantics as ops/trace.py.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3, dot, where as vwhere
from ..bsdf import MatFields, sample_material

ST_ROWS = 20
_INF = np.float32(np.inf)   # np scalar: jnp scalars become captured
                            # constants inside Pallas kernel bodies


# -- XLA-side state helpers -------------------------------------------------

def make_state(o: Vec3, d: Vec3, seed: jnp.ndarray, block_r: int):
    """Pack (R,) primary rays into the (20, Rp) state array, padded to a
    block multiple with dead rays."""
    n = o.x.shape[0]
    pad = (-n) % block_r
    row = lambda c, fill=0.0: jnp.pad(c, (0, pad), constant_values=fill)[None]
    zero = jnp.zeros((1, n + pad), jnp.float32)
    one = jnp.ones((1, n + pad), jnp.float32)
    seed_f = jax.lax.bitcast_convert_type(seed, jnp.float32)
    return jnp.concatenate([
        row(o.x), row(o.y), row(o.z),
        row(d.x), row(d.y), row(d.z),
        row(seed_f),
        jnp.pad(one[:, :n], ((0, 0), (0, pad))),       # alive (pad dead)
        one, one, one,                                  # mask
        zero, zero, zero,                               # color
        zero, zero, zero,                               # sky_mask
        zero, zero, one,                                # sky_dir (0,0,1)
    ], axis=0)


def unpack_state(state: jnp.ndarray, n: int):
    """Rows -> (color, sky_mask, sky_dir) Vec3s of (n,) components."""
    r = lambda i: state[i, :n]
    color = Vec3(r(11), r(12), r(13))
    sky_mask = Vec3(r(14), r(15), r(16))
    sky_dir = Vec3(r(17), r(18), r(19))
    return color, sky_mask, sky_dir


def _pad_rows(tab: jnp.ndarray, mult: int = 8) -> jnp.ndarray:
    r = tab.shape[0]
    pad = (-r) % mult
    return jnp.pad(tab, ((0, pad), (0, 0))) if pad else tab


# scenes with at most this many triangles intersect them densely inside
# the whole-trace megakernel (a (T, BR) Moller-Trumbore like the sphere
# table); larger meshes go through the BVH kernel path
SMALL_TRIS_MAX = 64

# packed-table VMEM residence budget for the megakernel's in-kernel BVH:
# clusters * 24 rows * 512 B must leave room for the bounce-loop working
# set in ~16 MB VMEM.  853 clusters = ~10 MB = ~109K triangles at K=128.
# DERIVED, not yet hardware-validated near the cap (the pool outage hit
# during this kernel's first TPU compile): if a large mesh fails Mosaic
# VMEM allocation, lower this via SRT_MEGA_PACKED_MAX (or force
# tri_backend="bvh") — the split HBM path serves any size.
MEGA_PACKED_MAX_CLUSTERS = int(_os.environ.get("SRT_MEGA_PACKED_MAX",
                                               "853"))

# per-cluster MT ray-slice gating in the megakernel's BVH traversal
# (_tris_clustered mt_slices): 1 = full-block MT (no gating).  Values
# > 1 must divide block_r/128; compile time grows ~linearly.  Env knob
# for the TPU sweep until a measured default lands.
MEGA_MT_SLICES = int(_os.environ.get("SRT_MEGA_MT_SLICES", "1"))

# one pallas_call is capped at ~1600 grid steps (Mosaic scoped SMEM,
# ~0.5 KB per step of a 1 MB v5e budget — the limit bvh_kernel measured);
# bigger renders split into sequential calls.  Module-level so tests can
# exercise the chunked forms at small sizes.
MEGA_MAX_BLOCKS = 1600


def small_tris_table(scene):
    """(T8, 24) dense triangle table for the megakernel, or None.

    cols: [v0 (0-2), e1 (3-5), e2 (6-8), n0 n1 n2 (9-17), material (18),
    active (19), pad].  Edges are the same f32 subtraction the dense path
    computes (ops/intersect.intersect_triangles)."""
    tr = scene.triangles
    n = tr.material.shape[0]
    if n == 0 or n > SMALL_TRIS_MAX or tr.clusters is not None:
        return None
    e1, e2 = tr.v1 - tr.v0, tr.v2 - tr.v0
    z = jnp.zeros_like(tr.v0.x)
    return _pad_rows(jnp.stack(
        [tr.v0.x, tr.v0.y, tr.v0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z,
         tr.n0.x, tr.n0.y, tr.n0.z, tr.n1.x, tr.n1.y, tr.n1.z,
         tr.n2.x, tr.n2.y, tr.n2.z, tr.material.astype(jnp.float32),
         tr.active.astype(jnp.float32), z, z, z, z], axis=-1))


def prim_tables(scene):
    """Device-side primitive/material tables in the kernel's layout.

    spheres (S8, 8): [cx cy cz radius material active 0 0]
    planes  (P8, 8): [px py pz nx ny nz material active]
    materials (M8, 16): [smooth metal spec emis_str trans ior
                         color.xyz emission.xyz 0 0 0 0]
    All f32; rows padded to a multiple of 8 with inactive slots."""
    sp, pln, m = scene.spheres, scene.planes, scene.materials
    z = lambda a: jnp.zeros_like(a, dtype=jnp.float32)
    sph_tab = None
    if sp.radius.shape[0]:
        sph_tab = _pad_rows(jnp.stack(
            [sp.center.x, sp.center.y, sp.center.z, sp.radius,
             sp.material.astype(jnp.float32), sp.active.astype(jnp.float32),
             z(sp.radius), z(sp.radius)], axis=-1))
    pln_tab = None
    if pln.material.shape[0]:
        pln_tab = _pad_rows(jnp.stack(
            [pln.position.x, pln.position.y, pln.position.z,
             pln.normal.x, pln.normal.y, pln.normal.z,
             pln.material.astype(jnp.float32),
             pln.active.astype(jnp.float32)], axis=-1))
    zm = z(m.smoothness)
    mat_tab = _pad_rows(jnp.stack(
        [m.smoothness, m.metallic, m.specular, m.emission_strength,
         m.transmittance, m.refraction_index,
         m.color.x, m.color.y, m.color.z,
         m.emission.x, m.emission.y, m.emission.z,
         zm, zm, zm, zm], axis=-1))
    return sph_tab, pln_tab, mat_tab


# -- in-kernel primitive intersection (N on sublanes, rays on lanes) --------

def _winner(t, tab, cols):
    """First-min one-hot winner select: (N, BR) candidate t's ->
    (t_best (1, BR), winner table columns as a list of (1, BR) rows).

    Matches jnp.argmin's first-index tie/all-inf semantics.  The
    attribute fetch is a per-column masked sublane reduction — exactly
    one sel element is nonzero per ray, so each sum reproduces a single
    table value exactly (an MXU one-hot dot is equally exact but costs
    ~0.6 us per f32-HIGHEST pass per block, measured ~2.4 ms/bounce at
    1080p across the three small tables; the VPU reduce is ~free)."""
    n = t.shape[0]
    t_best = jnp.min(t, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    imin = jnp.min(jnp.where(t == t_best, iota, jnp.float32(1e9)),
                   axis=0, keepdims=True)
    sel = jnp.where((t == t_best) & (iota == imin), 1.0, 0.0)
    attrs = [jnp.sum(tab[:, j:j + 1] * sel, axis=0, keepdims=True)
             for j in range(cols[0], cols[1])]
    return t_best, attrs


def _spheres(tab, o: Vec3, d: Vec3):
    """intersect_spheres (render.cl:180-204) in (S, BR) orientation;
    returns (t_best, [cx cy cz r mat] winner rows)."""
    col = lambda j: tab[:, j:j + 1]
    rc = Vec3(col(0) - o.x, col(1) - o.y, col(2) - o.z)
    b = rc.x * d.x + rc.y * d.y + rc.z * d.z
    c = (rc.x * rc.x + rc.y * rc.y + rc.z * rc.z) - col(3) * col(3)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = b - sq
    t1 = b + sq
    t = jnp.where(t0 < 0.0, t1, t0)
    valid = (disc >= 0.0) & (t >= 0.0) & (col(5) > 0.0)
    return _winner(jnp.where(valid, t, _INF), tab, (0, 5))


def _planes(tab, o: Vec3, d: Vec3):
    """intersect_planes (render.cl:206-221); returns
    (t_best, [nx ny nz mat] winner rows)."""
    col = lambda j: tab[:, j:j + 1]
    denom = col(3) * d.x + col(4) * d.y + col(5) * d.z
    num = (col(3) * (col(0) - o.x) + col(4) * (col(1) - o.y)
           + col(5) * (col(2) - o.z))
    t = num / denom
    valid = (denom != 0.0) & (t >= 0.0) & (col(7) > 0.0)
    return _winner(jnp.where(valid, t, _INF), tab, (3, 7))


def _tris_small(tab, o: Vec3, d: Vec3):
    """Dense Moller-Trumbore over a small (T8, 24) triangle table in
    (T, BR) orientation — intersect_triangles semantics (render.cl:243-275
    incl. the a == 0 and boundary tests).  Returns (t_best, 19 winner
    attribute rows [v0 e1 e2 n0 n1 n2 material])."""
    col = lambda j: tab[:, j:j + 1]
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    hx = d.y * e2z - d.z * e2y
    hy = d.z * e2x - d.x * e2z
    hz = d.x * e2y - d.y * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a
    sx = o.x - col(0)
    sy = o.y - col(1)
    sz = o.z - col(2)
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (d.x * qx + d.y * qy + d.z * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    valid = ((a != 0.0)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t > 0.0)
             & (col(19) > 0.0))
    t = jnp.where(valid, t, _INF)
    # MT's (u, v) ARE the barycentric weights (p = v0 + u e1 + v e2), so
    # the smooth normal interpolates per candidate and the winner select
    # moves only 4 attribute rows instead of 18 vertex attributes.  The
    # dense XLA path recomputes the weights from the hit position
    # (barycentric_weights, render.cl:223-241) — algebraically identical,
    # and this form avoids its p - v0 cancellation.  Invalid candidates
    # zero their weights: their u/v can be inf/NaN (a == 0), and a single
    # NaN would poison the 0/1-masked winner sum for the whole lane.
    u = jnp.where(valid, u, 0.0)
    v = jnp.where(valid, v, 0.0)
    w0 = 1.0 - u - v
    nx = col(9) * w0 + col(12) * u + col(15) * v
    ny = col(10) * w0 + col(13) * u + col(16) * v
    nz = col(11) * w0 + col(14) * u + col(17) * v
    t_best = jnp.min(t, axis=0, keepdims=True)
    n = t.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    imin = jnp.min(jnp.where(t == t_best, iota, jnp.float32(1e9)),
                   axis=0, keepdims=True)
    sel = jnp.where((t == t_best) & (iota == imin), 1.0, 0.0)
    pick = lambda q: jnp.sum(q * sel, axis=0, keepdims=True)
    n_raw = Vec3(pick(nx), pick(ny), pick(nz))
    return t_best, n_raw, pick(jnp.broadcast_to(col(18), t.shape))


def _tris_clustered(table, aabb8, order, o, d, live, t_init, *,
                    n_clusters, block_l, packed=False, mt_slices=1):
    """In-kernel BVH-clustered triangle traversal over a VMEM-resident
    table — the unified-megakernel form of ops/pallas/bvh_kernel.py's
    VMEM variant, operating on VALUE carries instead of scratch refs.

    Clusters are visited in the precomputed front-to-back ``order`` (SMEM
    (C,) i32); each cluster's AABB group is slab-tested against the LIVE
    best t (which starts at the sphere/plane seed and only tightens), and
    survivors run Moller-Trumbore with the candidate smooth normal
    interpolated from MT's (u, v) so the running state is just 6 rows:
    [t, won, nx, ny, nz, material].

    Tie semantics: WITHIN a cluster the lowest slot (= lowest global
    index after the BVH reorder) wins an exact-equal t; ACROSS clusters
    the first visited cluster wins (strict <) — the 6-row carry has no
    index to tie-break on, and carrying one would cost VMEM on every
    scene for a coincident-duplicate-geometry edge case.  The megakernel
    contract with the scan path is statistical agreement (RMSE bound),
    not bit identity; the split kernel (bvh_kernel._mt_update), whose
    contract IS bit identity with the dense path, tie-breaks on the
    global index across clusters too.

    ``mt_slices`` > 1 re-slabs each surviving cluster against STATIC
    128-lane-aligned ray slices under the live t bound and runs
    Moller-Trumbore only on slices that pass — the megakernel analog of
    the split kernel's per-sub-block gating.  Secondary-bounce rays are
    direction-incoherent, so the cluster set a whole 1536-ray block
    visits is far larger than what any 128-ray strip needs; gating cuts
    the MT lanes by that coherence ratio.  Bit-identical results: the
    per-column MT math and reductions are unchanged, and a skipped slice
    provably has no slab interval under the live bound, so no closer hit
    exists there.  Compile time scales ~linearly with the slice count
    (every cond duplicates the MT body), hence a knob rather than a
    constant.

    Returns (t_t, n_raw Vec3, m_tri) with t_t = +inf where no triangle
    beat the seed — the same contract the split BVH path feeds the
    bounce body."""
    inx = 1.0 / d.x
    iny = 1.0 / d.y
    inz = 1.0 / d.z
    shape = o.x.shape
    zero = jnp.zeros(shape, jnp.float32)

    def group_word(g, t_best):
        """Slab-test group g's 8 AABBs against the LIVE best t; one i32
        word of per-cluster hit bits (exact f32 power-of-two sum — Mosaic
        cannot scalar-read VMEM vectors)."""
        tile8 = aabb8[pl.ds(pl.multiple_of(g * 8, 8), 8), :]
        col8 = lambda k: tile8[:, k:k + 1]
        t1x = (col8(0) - o.x) * inx
        t2x = (col8(3) - o.x) * inx
        t1y = (col8(1) - o.y) * iny
        t2y = (col8(4) - o.y) * iny
        t1z = (col8(2) - o.z) * inz
        t2z = (col8(5) - o.z) * inz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.minimum(jnp.maximum(t1z, t2z), t_best))
        maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live
        flags = jnp.max(jnp.where(maybe, 1.0, 0.0), axis=1, keepdims=True)
        weights = (2.0 ** jax.lax.broadcasted_iota(
            jnp.int32, (8, 1), 0).astype(jnp.float32))
        return jnp.sum(flags * weights).astype(jnp.int32)

    def visit_group(j, carry):
        g = order[j]
        word = group_word(g, carry[0])

        def scan_bits(carry):
            def bit(k, carry):
                return jax.lax.cond(((word >> k) & 1) > 0,
                                    lambda c_: mt(g * 8 + k, c_),
                                    lambda c_: c_, carry)
            return jax.lax.fori_loop(0, 8, bit, carry)

        return jax.lax.cond(word != 0, scan_bits, lambda c_: c_, carry)

    def mt(c, carry):
        row0 = pl.multiple_of(c * block_l, block_l)
        tile = table[pl.ds(row0, block_l), :]
        if packed:
            # (24, 128) packed tile -> MT orientation; the one-hot MXU
            # transpose is exact (bvh_kernel._tile_transpose).  Packed
            # residence is what lets ~100K-triangle tables live in VMEM
            # (96 B/tri vs the row layout's 512), extending the
            # megakernel to production-size meshes.
            from .bvh_kernel import _tile_transpose
            tile = _tile_transpose(tile)
        col = lambda k: tile[:, k:k + 1]

        def mt_cols(ox, oy, oz, dx, dy, dz, cs):
            """Moller-Trumbore on one static column slice of the block's
            rays (the full block when mt_slices == 1) — per-column math
            and reductions, so slicing never changes results."""
            t_best, won, nx_b, ny_b, nz_b, m_b = cs
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / a
            sx = ox - col(0)
            sy = oy - col(1)
            sz = oz - col(2)
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            valid = ((a != 0.0)
                     & (u >= 0.0) & (u <= 1.0)
                     & (v >= 0.0) & (u + v <= 1.0)
                     & (t > 0.0)
                     & (col(19) > 0.0))
            t = jnp.where(valid, t, _INF)
            u = jnp.where(valid, u, 0.0)
            v = jnp.where(valid, v, 0.0)
            w0 = 1.0 - u - v
            nx = col(9) * w0 + col(12) * u + col(15) * v
            ny = col(10) * w0 + col(13) * u + col(16) * v
            nz = col(11) * w0 + col(14) * u + col(17) * v
            local_t = jnp.min(t, axis=0, keepdims=True)
            n = t.shape[0]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (n, 1), 0).astype(jnp.float32)
            imin = jnp.min(jnp.where(t == local_t, iota, jnp.float32(1e9)),
                           axis=0, keepdims=True)
            sel = jnp.where((t == local_t) & (iota == imin), 1.0, 0.0)
            pick = lambda q: jnp.sum(q * sel, axis=0, keepdims=True)
            better = local_t < t_best
            return (jnp.where(better, local_t, t_best),
                    jnp.where(better, 1.0, won),
                    jnp.where(better, pick(nx), nx_b),
                    jnp.where(better, pick(ny), ny_b),
                    jnp.where(better, pick(nz), nz_b),
                    jnp.where(better,
                              pick(jnp.broadcast_to(col(18), t.shape)),
                              m_b))

        if mt_slices == 1:
            return mt_cols(o.x, o.y, o.z, d.x, d.y, d.z, carry)

        # cluster c's box as scalars (one-hot masked reduction over its
        # aligned group-of-8 tile — Mosaic cannot scalar-read vectors)
        tile8 = aabb8[pl.ds(pl.multiple_of((c // 8) * 8, 8), 8), :]
        onehot = jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (8, 1), 0) == c % 8, 1.0, 0.0)
        bx = lambda k: jnp.sum(tile8[:, k:k + 1] * onehot)
        wdt = shape[1] // mt_slices
        parts = [[] for _ in range(6)]
        t_live = carry[0]
        for s in range(mt_slices):
            sl = (slice(None), slice(s * wdt, (s + 1) * wdt))
            osx, osy, osz = o.x[sl], o.y[sl], o.z[sl]
            t1x = (bx(0) - osx) * inx[sl]
            t2x = (bx(3) - osx) * inx[sl]
            t1y = (bx(1) - osy) * iny[sl]
            t2y = (bx(4) - osy) * iny[sl]
            t1z = (bx(2) - osz) * inz[sl]
            t2z = (bx(5) - osz) * inz[sl]
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                          jnp.maximum(t1y, t2y)),
                              jnp.minimum(jnp.maximum(t1z, t2z),
                                          t_live[sl]))
            maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & live[sl]
            pred = jnp.max(jnp.where(maybe, 1.0, 0.0)) > 0.0
            cs = tuple(r[sl] for r in carry)
            new = jax.lax.cond(
                pred,
                lambda cs_, _o=(osx, osy, osz), _sl=sl: mt_cols(
                    _o[0], _o[1], _o[2],
                    d.x[_sl], d.y[_sl], d.z[_sl], cs_),
                lambda cs_: cs_, cs)
            for i in range(6):
                parts[i].append(new[i])
        return tuple(jnp.concatenate(p, axis=1) for p in parts)

    init = (t_init, zero, zero, zero, zero, zero)
    t_best, won, nx_b, ny_b, nz_b, m_b = jax.lax.fori_loop(
        0, n_clusters // 8, visit_group, init)
    t_t = jnp.where(won > 0.0, t_best, _INF)
    return t_t, Vec3(nx_b, ny_b, nz_b), m_b


def _gather_mat(mat_tab, m_idx) -> MatFields:
    """gather_materials semantics as in-kernel 0/1 masked reductions
    (exact: one nonzero per ray; see _winner for why not an MXU dot)."""
    m8 = mat_tab.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m8, 1), 0).astype(jnp.float32)
    oh = jnp.where(iota == m_idx, 1.0, 0.0)
    r = lambda i: jnp.sum(mat_tab[:, i:i + 1] * oh, axis=0, keepdims=True)
    return MatFields(
        smoothness=r(0), metallic=r(1), specular=r(2),
        emission_strength=r(3), transmittance=r(4), refraction_index=r(5),
        color=Vec3(r(6), r(7), r(8)), emission=Vec3(r(9), r(10), r(11)))


# -- the bounce body (shared by the per-bounce and whole-trace kernels) -----

def _bounce_body(o, d, seed, alive, mask, color, sky_mask, sky_dir,
                 sph, pln, mat_tab, tri, last, prims=None):
    """One iteration of the trace bounce loop (render.cl:403-467) on
    (1, BR) rows — verbatim ops/trace.trace_rays semantics.

    ``last`` is a python bool (whole-trace kernel, statically skips the
    BSDF on the final bounce — its result is fully masked) or a traced
    scalar pred (per-bounce kernel).  ``sph``/``pln`` are None for absent
    categories (a static scene-shape property); ``tri`` is None or a
    ``(t_t, normal_fn)`` pair giving the winning triangle's t and a
    callable position -> (unnormalized smooth normal Vec3, material row)
    (from the BVH kernel's attribute rows or the in-kernel dense table)."""
    inf = jnp.full(o.x.shape, _INF)
    zero = jnp.zeros(o.x.shape, jnp.float32)
    t_s = t_p = t_t = inf
    if prims is not None:
        # the clustered-traversal caller already intersected the dense
        # primitives (their best t seeds the BVH slab far bound)
        t_s, s_attr, t_p, p_attr = prims
    else:
        if sph is not None:
            t_s, s_attr = _spheres(sph, o, d)
        if pln is not None:
            t_p, p_attr = _planes(pln, o, d)
    if tri is not None:
        t_t, tri_normal_fn = tri

    # nearest-hit resolution exactly as ops/intersect.closest_hit
    t = jnp.minimum(jnp.minimum(t_s, t_p), t_t)
    hit = jnp.isfinite(t)
    is_s = t_s == t
    is_p = (~is_s) & (t_p == t)
    position = o + d * t

    if sph is not None:
        n_sph = (position - Vec3(s_attr[0], s_attr[1], s_attr[2])
                 ) / s_attr[3]
        m_sph = s_attr[4]
    else:
        n_sph, m_sph = Vec3(inf, inf, inf), zero
    if pln is not None:
        n_pln = Vec3(p_attr[0], p_attr[1], p_attr[2])
        m_pln = p_attr[3]
    else:
        n_pln, m_pln = Vec3(inf, inf, inf), zero
    if tri is not None:
        n_raw, m_tri = tri_normal_fn(position)
        inv_len = 1.0 / jnp.sqrt(dot(n_raw, n_raw))
        n_tri = n_raw * inv_len
        normal = vwhere(is_s, n_sph, vwhere(is_p, n_pln, n_tri))
        m_idx = jnp.where(is_s, m_sph, jnp.where(is_p, m_pln, m_tri))
    else:
        normal = vwhere(is_s, n_sph, n_pln)
        m_idx = jnp.where(is_s, m_sph, m_pln)
    front = dot(normal, d) < 0.0
    normal = normal * jnp.where(front, 1.0, -1.0)

    # the bounce body of ops/trace.trace_rays, verbatim semantics
    h_alive = alive & hit
    m_alive = alive & (~hit)
    sky_mask = vwhere(m_alive, mask, sky_mask)
    sky_dir = vwhere(m_alive, d, sky_dir)

    mat = _gather_mat(mat_tab, m_idx)
    emission = mask * mat.emission * mat.emission_strength
    color = vwhere(h_alive, color + emission, color)

    if last is True:
        # final bounce: emission only, no new ray (render.cl:415-416);
        # the BSDF sample would be fully discarded, so skip it
        dead = h_alive & (~h_alive)
        return o, d, seed, dead, mask, color, sky_mask, sky_dir
    cont = h_alive if last is False else (h_alive & (~last))

    ms = sample_material(position, normal, front, d, mat, seed)
    o = vwhere(cont, ms.origin, o)
    d = vwhere(cont, ms.direction, d)
    mask = vwhere(cont, mask * ms.mask_mul, mask)
    seed = jnp.where(cont, ms.seed, seed)
    return o, d, seed, cont, mask, color, sky_mask, sky_dir


# -- the per-bounce kernel (mesh scenes: interleaves with the BVH kernel) ---

def _bounce_kernel(counts, flags, state, *tabs_and_out,
                   has_spheres, has_planes, has_tris):
    """One bounce for one ray block; dead blocks pass state through.

    tabs_and_out: [tri_rows] [sph_tab] [pln_tab] mat_tab out  (presence of
    the optional inputs is static per scene shape)."""
    i = 0
    tri = sph = pln = None
    if has_tris:
        tri = tabs_and_out[i]; i += 1
    if has_spheres:
        sph = tabs_and_out[i]; i += 1
    if has_planes:
        pln = tabs_and_out[i]; i += 1
    mat_tab = tabs_and_out[i]
    out = tabs_and_out[i + 1]
    b = pl.program_id(0)

    @pl.when(counts[b] == 0)
    def _():
        out[...] = state[...]

    @pl.when(counts[b] > 0)
    def _():
        st = state[...]
        row = lambda i: st[i:i + 1, :]
        o = Vec3(row(0), row(1), row(2))
        d = Vec3(row(3), row(4), row(5))
        seed = pltpu.bitcast(row(6), jnp.uint32)
        alive = row(7) > 0.0
        mask = Vec3(row(8), row(9), row(10))
        color = Vec3(row(11), row(12), row(13))
        sky_mask = Vec3(row(14), row(15), row(16))
        sky_dir = Vec3(row(17), row(18), row(19))

        def tri_normal(position, _tri=tri):
            """Smooth barycentric normal from the BVH kernel's winner
            attribute rows (barycentric_weights_from_edges semantics —
            identical f32 math to the dense XLA shading path)."""
            ta = lambda i: _tri[1 + i:2 + i, :]
            tv0 = Vec3(ta(0), ta(1), ta(2))
            ea = Vec3(ta(3), ta(4), ta(5))
            eb = Vec3(ta(6), ta(7), ta(8))
            c = position - tv0
            d00 = dot(ea, ea)
            d01 = dot(ea, eb)
            d11 = dot(eb, eb)
            d20 = dot(c, ea)
            d21 = dot(c, eb)
            den = d00 * d11 - d01 * d01
            w0 = (d11 * d20 - d01 * d21) / den
            w1 = (d00 * d21 - d01 * d20) / den
            w2 = 1.0 - w0 - w1
            n = (Vec3(ta(9), ta(10), ta(11)) * w2
                 + Vec3(ta(12), ta(13), ta(14)) * w0
                 + Vec3(ta(15), ta(16), ta(17)) * w1)
            return n, ta(18)

        tri_pair = None if tri is None else (tri[0:1, :], tri_normal)
        o, d, seed, cont, mask, color, sky_mask, sky_dir = _bounce_body(
            o, d, seed, alive, mask, color, sky_mask, sky_dir,
            sph, pln, mat_tab, tri_pair, last=flags[0] > 0)

        out[...] = jnp.concatenate([
            o.x, o.y, o.z, d.x, d.y, d.z,
            pltpu.bitcast(seed, jnp.float32),
            jnp.where(cont, 1.0, 0.0),
            mask.x, mask.y, mask.z, color.x, color.y, color.z,
            sky_mask.x, sky_mask.y, sky_mask.z,
            sky_dir.x, sky_dir.y, sky_dir.z,
        ], axis=0)


# -- the whole-trace megakernel (triangle-free scenes) ----------------------

def _trace_kernel(scal, scali, *tabs_and_out, num_bounces,
                  num_samples, width, tile, n_rays, block_r,
                  has_spheres, has_planes, has_tris, n_clusters=0,
                  block_l=0, tri_packed=False, mt_slices=1,
                  fold_sky=False, early_exit=True):
    """Ray generation + the full bounce loop for one ray block — ray state
    never leaves VMEM; only the 9 result rows (color, deferred-sky
    throughput and direction) are written back.  Small meshes (<=
    SMALL_TRIS_MAX) intersect densely in-kernel per bounce.

    scal (f32 SMEM): [rot 3x3 row-major (9), camera pos (3), aspect_ratio,
    fov_scale]; scali (i32 SMEM): [time (u32 bits), row0].  All traced —
    camera motion and the progressive time seed never recompile.

    Raygen mirrors ops/camera.generate_rays bit-for-bit: the pixel id is
    reconstructed from the global ray index (inverting tiled_pixel_order's
    (band/th, W/tw, th, tw) enumeration in integer ops), and the jitter /
    NDC / rotate / normalize chain uses the same f32 expressions."""
    from .. import rng

    i = 0
    sph = pln = tri_tab = cl_order = cl_table = cl_aabb = None
    if has_spheres:
        sph = tabs_and_out[i]; i += 1
    if has_planes:
        pln = tabs_and_out[i]; i += 1
    if has_tris and n_clusters == 0:
        tri_tab = tabs_and_out[i]; i += 1
    if n_clusters:
        cl_order = tabs_and_out[i]
        cl_table = tabs_and_out[i + 1]
        cl_aabb = tabs_and_out[i + 2]
        i += 3
    mat_tab = tabs_and_out[i]
    out = tabs_and_out[i + 1]
    b = pl.program_id(0)
    g = (jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1)
         + b * jnp.int32(block_r))
    s_i = g % num_samples if num_samples > 1 else jnp.zeros_like(g)
    p = g // num_samples if num_samples > 1 else g
    if tile is None:
        px_i = p % width
        py_i = p // width
    else:
        th, tw = tile
        cc = width // tw
        dd = p % tw
        bb = (p // tw) % th
        c_ = (p // (tw * th)) % cc
        aa = p // (tw * th * cc)
        px_i = c_ * tw + dd
        py_i = aa * th + bb
    local_id = py_i * jnp.int32(width) + px_i
    pixel_id = pltpu.bitcast(
        local_id + scali[1] * jnp.int32(width), jnp.uint32)
    time_u = pltpu.bitcast(jnp.full(g.shape, scali[0], jnp.int32),
                           jnp.uint32)
    # rng.pixel_seed: (sample + id * S) * time * 5304 in wrapping uint32
    seed = (pltpu.bitcast(s_i, jnp.uint32)
            + pixel_id * jnp.uint32(num_samples)) * time_u * jnp.uint32(5304)

    px = px_i.astype(jnp.float32)
    py = (py_i + scali[1]).astype(jnp.float32)   # == f32(pixel_id // W)
    seed, u1 = rng.next_uniform(seed)
    seed, u2 = rng.next_uniform(seed)
    ndc_x = (px + u1) / jnp.float32(width)
    # the NDC y divisor is the FULL image height even for a sharded band
    # (generate_rays semantics); it rides in scal[14]
    ndc_y = (py + u2) / scal[14]
    sx = (2.0 * ndc_x - 1.0) * scal[12] * scal[13]
    sy = (1.0 - 2.0 * ndc_y) * scal[13]
    neg1 = jnp.full(sx.shape, -1.0, jnp.float32)
    dx = scal[0] * sx + scal[1] * sy + scal[2] * neg1
    dy = scal[3] * sx + scal[4] * sy + scal[5] * neg1
    dz = scal[6] * sx + scal[7] * sy + scal[8] * neg1
    d = Vec3(dx, dy, dz)
    d = d * (1.0 / jnp.sqrt(dot(d, d)))
    full = lambda i: jnp.full(sx.shape, scal[i], jnp.float32)
    o = Vec3(full(9), full(10), full(11))

    alive = g < n_rays
    zero = jnp.zeros(sx.shape, jnp.float32)
    one = jnp.ones(sx.shape, jnp.float32)
    mask = Vec3(one, one, one)
    color = Vec3(zero, zero, zero)
    sky_mask = Vec3(zero, zero, zero)
    sky_dir = Vec3(zero, zero, one)

    def one_bounce(carry, last):
        o, d, seed_f, alive_f, mask, color, sky_mask, sky_dir = carry
        seed = pltpu.bitcast(seed_f, jnp.uint32)
        alive = alive_f > 0.0
        tri = None
        prims = None
        if tri_tab is not None:
            t_t, n_raw, m_tri = _tris_small(tri_tab, o, d)
            tri = (t_t, lambda pos, _n=n_raw, _m=m_tri: (_n, _m))
        if cl_table is not None:
            # dense primitives first: their best t seeds the slab far
            # bound so clusters behind a sphere/plane hit are skipped
            inf_row = jnp.full(alive_f.shape, _INF)
            t_s, s_attr = (_spheres(sph, o, d) if sph is not None
                           else (inf_row, None))
            t_p, p_attr = (_planes(pln, o, d) if pln is not None
                           else (inf_row, None))
            prims = (t_s, s_attr, t_p, p_attr)
            t_t, n_raw, m_tri = _tris_clustered(
                cl_table, cl_aabb, cl_order, o, d, alive,
                jnp.minimum(t_s, t_p), n_clusters=n_clusters,
                block_l=block_l, packed=tri_packed,
                mt_slices=mt_slices)
            tri = (t_t, lambda pos, _n=n_raw, _m=m_tri: (_n, _m))
        o, d, seed, alive, mask, color, sky_mask, sky_dir = _bounce_body(
            o, d, seed, alive, mask, color, sky_mask, sky_dir,
            sph, pln, mat_tab, tri, last=last, prims=prims)
        return (o, d, pltpu.bitcast(seed, jnp.float32),
                jnp.where(alive, 1.0, 0.0), mask, color, sky_mask, sky_dir)

    # Bounce 0 unrolls statically (primary rays are always live, and the
    # straight-line body schedules better), bounces 1..n-2 run as an
    # in-kernel while_loop that exits as soon as the BLOCK has no live
    # ray (result-neutral: a dead block's bounces are fully masked;
    # deep-bounce renders stop iterating over sky/emissive regions), and
    # the final bounce unrolls statically too (its BSDF sample is dead
    # code).  A full python unroll is not an option — it sent Mosaic
    # compile time to minutes at 10 bounces.
    carry = (o, d, pltpu.bitcast(seed, jnp.float32),
             jnp.where(alive, 1.0, 0.0), mask, color, sky_mask, sky_dir)
    if num_bounces > 1:
        carry = one_bounce(carry, False)
    if num_bounces > 2:
        if early_exit:
            def cond(iv):
                i, c = iv
                return (i < num_bounces - 2) & (jnp.sum(c[3]) > 0.0)

            def body(iv):
                i, c = iv
                return i + 1, one_bounce(c, False)

            _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
        else:
            # enclosed scene (SceneFlags.sky_reachable=False): rays only
            # die on the final bounce, so the liveness reduction above
            # never fires — a plain fori_loop drops its cost (config 1:
            # 642 -> ~735 Mrays/s)
            carry = jax.lax.fori_loop(
                0, num_bounces - 2, lambda _, c: one_bounce(c, False),
                carry)
    o, d, seed_f, alive_f, mask, color, sky_mask, sky_dir = \
        one_bounce(carry, True)

    if fold_sky:
        # analytic gradient environment evaluated IN-KERNEL on the
        # deferred-miss rows (the same ops.sky.sky_gradient source), so
        # only the 3 radiance rows leave the kernel and the separate XLA
        # sky pass disappears
        from ..scene_types import SkyParams
        from ..sky import sky_gradient
        s = lambda k: scal[k]
        skyp = SkyParams(
            sun_focus=s(30), sun_intensity=s(31),
            sun_color=Vec3(s(24), s(25), s(26)),
            sun_direction=Vec3(s(27), s(28), s(29)),
            horizon_color=Vec3(s(15), s(16), s(17)),
            zenith_color=Vec3(s(18), s(19), s(20)),
            ground_color=Vec3(s(21), s(22), s(23)))
        skyc = sky_gradient(sky_dir, skyp)
        color = color + sky_mask * skyc
        out[...] = jnp.concatenate([color.x, color.y, color.z], axis=0)
    else:
        out[...] = jnp.concatenate([
            color.x, color.y, color.z,
            sky_mask.x, sky_mask.y, sky_mask.z,
            sky_dir.x, sky_dir.y, sky_dir.z,
        ], axis=0)


def trace_full_fused(scene, rot, position, aspect_ratio, fov_scale,
                     time, *, width: int, height: int, num_samples: int,
                     num_bounces: int, row0=0, tile_height: int = None,
                     ray_tile=None, block_r: int = 1536,
                     interpret: bool = False):
    """Whole-trace megakernel path: per-ray RADIANCE for the band's
    (tile_height*W*S,) rays — generate_rays + trace_rays + the deferred
    environment term in one.  Gradient-sky scenes evaluate the sky
    in-kernel; texture skyboxes sample in XLA on the returned miss rows
    (the MXU two-hot sampler needs the whole image resident)."""
    if tile_height is None:
        tile_height = height
    n_rays = width * tile_height * num_samples
    rp = ((n_rays + block_r - 1) // block_r) * block_r

    # Mosaic charges ~0.5 KB of scoped SMEM per grid step and v5e SMEM
    # is 1 MB, so one pallas_call is capped at ~1600 blocks (the same
    # measured limit bvh_kernel chunks at).  Larger renders (1080p at
    # 2+ spp, 4K) split into row BANDS, each its own call: band rays
    # regenerate from row0+y, so seeds/jitter are the global per-pixel
    # functions either way, and with the band height a multiple of the
    # tile row the full-range ray-tile order is exactly the
    # concatenation of per-band tile orders (the shard_map path already
    # relies on the same alignment argument) — bit-identical output.
    max_blocks = MEGA_MAX_BLOCKS
    if rp // block_r > max_blocks:
        th_step = ray_tile[0] if ray_tile else 1
        rows_cap = (max_blocks * block_r) // (width * num_samples)
        band_h = max(th_step, (rows_cap // th_step) * th_step)
        parts = []
        y = 0
        while y < tile_height:
            h = min(band_h, tile_height - y)
            parts.append(trace_full_fused(
                scene, rot, position, aspect_ratio, fov_scale, time,
                width=width, height=height, num_samples=num_samples,
                num_bounces=num_bounces, row0=row0 + y, tile_height=h,
                ray_tile=ray_tile, block_r=block_r, interpret=interpret))
            y += h
        return Vec3(*(jnp.concatenate([getattr(p, c) for p in parts])
                      for c in "xyz"))

    sph_tab, pln_tab, mat_tab = prim_tables(scene)
    tri_tab = small_tris_table(scene)

    # clustered meshes whose table fits VMEM traverse in-kernel; the
    # front-to-back cluster order (from the camera position — primaries
    # dominate) is computed once per call in XLA
    cl = scene.triangles.clusters
    n_clusters = block_l = 0
    cl_order = cl_table_op = None
    tri_packed = False
    if cl is not None:
        from .bvh_kernel import VMEM_TABLE_MAX_SLOTS, _TROWS
        n_clusters = cl.aabb.shape[0]
        # big tables ride VMEM in the packed transposed form (96 B/tri);
        # small ones stay in the row layout (no per-visit transpose)
        tri_packed = (cl.table_t.shape[0] > VMEM_TABLE_MAX_SLOTS
                      and cl.table_tr is not None
                      # this kernel reads one (24, 128) tile per cluster;
                      # multi-packet (K > 128) tables are split-path only
                      and cl.table_tr.shape[1] == _TROWS)
        if tri_packed:
            cl_table_op = cl.table_tr.reshape(-1, 128)
            block_l = _TROWS
        else:
            cl_table_op = cl.table_t
            block_l = cl.table_t.shape[0] // max(n_clusters, 1)
        centers = (cl.aabb[:, 0:3] + cl.aabb[:, 3:6]) * 0.5
        cam = jnp.stack([jnp.asarray(position.x, jnp.float32).reshape(()),
                         jnp.asarray(position.y, jnp.float32).reshape(()),
                         jnp.asarray(position.z, jnp.float32).reshape(())])
        d2 = jnp.sum((centers - cam[None, :]) ** 2, axis=1)
        # the kernel scans GROUPS of 8 clusters (one slab word each);
        # order groups by their nearest member (sentinel-padded groups
        # sort last and their slab word is always 0)
        cl_order = jnp.argsort(d2.reshape(-1, 8).min(axis=1)
                               ).astype(jnp.int32)

    fold_sky = scene.skybox is None
    sk = scene.sky
    f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(())
    v3 = lambda v: [f32(v.x), f32(v.y), f32(v.z)]
    scal = jnp.stack(
        [f32(c) for c in rot]
        + [f32(position.x), f32(position.y), f32(position.z),
           f32(aspect_ratio), f32(fov_scale), f32(height)]
        + v3(sk.horizon_color) + v3(sk.zenith_color) + v3(sk.ground_color)
        + v3(sk.sun_color) + v3(sk.sun_direction)
        + [f32(sk.sun_focus), f32(sk.sun_intensity)])
    time_i = jax.lax.bitcast_convert_type(
        jnp.asarray(time, jnp.uint32).reshape(()), jnp.int32)
    scali = jnp.stack([time_i, jnp.asarray(row0, jnp.int32).reshape(())])

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole = lambda t: pl.BlockSpec((t.shape[0], t.shape[1]), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    inputs = [scal, scali]
    in_specs = [smem, smem]
    if sph_tab is not None:
        inputs.append(sph_tab)
        in_specs.append(whole(sph_tab))
    if pln_tab is not None:
        inputs.append(pln_tab)
        in_specs.append(whole(pln_tab))
    if tri_tab is not None:
        inputs.append(tri_tab)
        in_specs.append(whole(tri_tab))
    if cl is not None:
        inputs += [cl_order, cl_table_op, cl.aabb]
        in_specs += [smem, whole(cl_table_op), whole(cl.aabb)]
    inputs.append(mat_tab)
    in_specs.append(whole(mat_tab))

    mt_slices = MEGA_MT_SLICES if n_clusters else 1
    if mt_slices != 1 and (mt_slices < 1
                           or (block_r // 128) % mt_slices != 0):
        # validate the env knob HERE: an invalid value otherwise dies
        # deep in the pallas trace as an opaque concat-shape mismatch
        raise ValueError(
            f"SRT_MEGA_MT_SLICES={mt_slices} must be >= 1 and divide "
            f"block_r/128 = {block_r // 128} (128-lane slice alignment)")
    kernel = functools.partial(
        _trace_kernel, num_bounces=num_bounces, num_samples=num_samples,
        width=width, tile=ray_tile, n_rays=n_rays, block_r=block_r,
        has_spheres=sph_tab is not None, has_planes=pln_tab is not None,
        has_tris=tri_tab is not None or cl is not None,
        n_clusters=n_clusters, block_l=block_l, tri_packed=tri_packed,
        mt_slices=mt_slices,
        fold_sky=fold_sky, early_exit=scene.flags.sky_reachable)

    n_out = 3 if fold_sky else 9
    rows = pl.pallas_call(
        kernel,
        grid=(rp // block_r,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, block_r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, rp), jnp.float32),
        interpret=interpret,
    )(*inputs)
    rows = jax.lax.optimization_barrier(rows)
    r = lambda i: rows[i, :n_rays]
    color = Vec3(r(0), r(1), r(2))
    if fold_sky:
        return color
    from ..sky import sky_color
    sky_mask = Vec3(r(3), r(4), r(5))
    sky_dir = Vec3(r(6), r(7), r(8))
    skyc = jax.lax.optimization_barrier(
        sky_color(sky_dir, scene.sky, scene.skybox))
    return color + sky_mask * skyc


def bounce_step(state: jnp.ndarray, is_last: jnp.ndarray, sph_tab, pln_tab,
                mat_tab, tri_rows=None, block_r: int = 1536,
                interpret: bool = False) -> jnp.ndarray:
    """Advance the whole (20, Rp) ray state by one bounce.

    ``is_last`` is a traced i32 scalar (1 on the final bounce: emission
    only, no new ray — render.cl:415-416).  ``tri_rows`` is the (20, Rp)
    [t, attrs...] output of the BVH kernel for mesh scenes, or None.
    Blocks whose rays are all dead are passed through untouched."""
    rp = state.shape[1]
    # same ~1600-block scoped-SMEM budget as trace_full_fused /
    # bvh_kernel: larger states advance as sequential column chunks
    # (block_r-aligned slices — per-ray independent, so chunking is
    # bit-neutral)
    max_blocks = MEGA_MAX_BLOCKS
    if rp // block_r > max_blocks:
        chunk = max_blocks * block_r
        parts = []
        for s in range(0, rp, chunk):
            e = min(s + chunk, rp)
            parts.append(bounce_step(
                state[:, s:e], is_last, sph_tab, pln_tab, mat_tab,
                tri_rows=None if tri_rows is None else tri_rows[:, s:e],
                block_r=block_r, interpret=interpret))
        return jnp.concatenate(parts, axis=1)
    grid = (rp // block_r,)
    counts = (state[7].reshape(-1, block_r) > 0.0).any(axis=1)
    counts = counts.astype(jnp.int32)
    flags = jnp.asarray(is_last, jnp.int32).reshape((1,))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    band = lambda r: pl.BlockSpec((r, block_r), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    whole = lambda t: pl.BlockSpec((t.shape[0], t.shape[1]), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    inputs = [counts, flags, state]
    in_specs = [smem, smem, band(ST_ROWS)]
    if tri_rows is not None:
        inputs.append(tri_rows)
        in_specs.append(band(tri_rows.shape[0]))
    if sph_tab is not None:
        inputs.append(sph_tab)
        in_specs.append(whole(sph_tab))
    if pln_tab is not None:
        inputs.append(pln_tab)
        in_specs.append(whole(pln_tab))
    inputs.append(mat_tab)
    in_specs.append(whole(mat_tab))

    kernel = functools.partial(
        _bounce_kernel,
        has_spheres=sph_tab is not None,
        has_planes=pln_tab is not None,
        has_tris=tri_rows is not None)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=band(ST_ROWS),
        out_shape=jax.ShapeDtypeStruct((ST_ROWS, rp), jnp.float32),
        interpret=interpret,
    )(*inputs)
