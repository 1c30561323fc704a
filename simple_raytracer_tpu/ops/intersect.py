"""Vectorized primitive intersection and nearest-hit resolution.

The reference's ``closest_intersection`` (render.cl:293-378) is a per-ray
linear scan with a type switch.  TPU-native form: intersect every ray against
every primitive of each type as dense (R, N) batches, reduce with a running
(t, index) argmin, then gather shading data for the single winner per ray.
The primitive formulas are reproduced exactly (degenerate cases included) so
converged images match the reference at the RMSE level:

  - sphere quadratic       render.cl:180-204
  - plane                  render.cl:206-221
  - Moller-Trumbore        render.cl:243-275
  - barycentric weights    render.cl:223-241 (incl. the (w2,w0,w1) rotation)
  - front-face flip        render.cl:372-375

The AABB early-out for models (render.cl:316-331) is a per-ray perf trick
with no effect on results (the box bounds its triangles); the dense batch
path simply tests all triangles, and the Pallas kernel / BVH path recovers
the culling benefit.
"""
from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .vec import Vec3, dot, cross, normalize, where as vwhere
from .scene_types import DeviceScene, SpheresSoA, PlanesSoA, TrianglesSoA

_INF = np.float32(np.inf)


class Hit(NamedTuple):
    """Resolved nearest intersection for each ray (all (R,) arrays)."""
    hit: jnp.ndarray        # bool: any intersection
    t: jnp.ndarray          # f32: distance (inf on miss)
    position: Vec3
    normal: Vec3            # unit, flipped toward the ray (render.cl:373-374)
    front: jnp.ndarray      # bool: hit the outside (pre-flip orientation)
    material: jnp.ndarray   # i32 material index (garbage on miss)


def _bcast_table(t: jnp.ndarray) -> jnp.ndarray:
    return t[None, :]


def _bcast_rays(r: jnp.ndarray) -> jnp.ndarray:
    return r[:, None]


def intersect_spheres(o: Vec3, d: Vec3, s: SpheresSoA):
    """(R,) rays x (Ns,) spheres -> per-ray (t_best, idx_best).

    Mirrors intersect_sphere (render.cl:180-204): b = dot(c-o, d),
    c = |c-o|^2 - r^2, disc = b^2 - c; t = b - sqrt(disc), falling back to
    b + sqrt(disc) when negative; miss if still negative (t == 0 is a hit)."""
    rc = Vec3(
        _bcast_table(s.center.x) - _bcast_rays(o.x),
        _bcast_table(s.center.y) - _bcast_rays(o.y),
        _bcast_table(s.center.z) - _bcast_rays(o.z),
    )
    db = Vec3(_bcast_rays(d.x), _bcast_rays(d.y), _bcast_rays(d.z))
    b = dot(rc, db)
    c = dot(rc, rc) - _bcast_table(s.radius * s.radius)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = b - sq
    t1 = b + sq
    t = jnp.where(t0 < 0.0, t1, t0)
    valid = (disc >= 0.0) & (t >= 0.0) & _bcast_table(s.active)
    t = jnp.where(valid, t, _INF)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.min(t, axis=1)
    return t_best, idx


def intersect_planes(o: Vec3, d: Vec3, p: PlanesSoA):
    """Mirrors intersect_plane (render.cl:206-221): denom == 0 exact-zero
    test, backwards (t < 0) rejected, t == 0 accepted."""
    n = Vec3(_bcast_table(p.normal.x), _bcast_table(p.normal.y), _bcast_table(p.normal.z))
    db = Vec3(_bcast_rays(d.x), _bcast_rays(d.y), _bcast_rays(d.z))
    denom = dot(n, db)
    po = Vec3(
        _bcast_table(p.position.x) - _bcast_rays(o.x),
        _bcast_table(p.position.y) - _bcast_rays(o.y),
        _bcast_table(p.position.z) - _bcast_rays(o.z),
    )
    t = dot(n, po) / denom
    valid = (denom != 0.0) & (t >= 0.0) & _bcast_table(p.active)
    t = jnp.where(valid, t, _INF)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.min(t, axis=1)
    return t_best, idx


def _tri_chunk(o: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3,
               active: jnp.ndarray):
    """Moller-Trumbore for a (R,) x (Tc,) block. Returns (t, valid) (R,Tc).

    Mirrors intersect_triangle (render.cl:243-275): a == 0 exact test,
    u in [0,1], v >= 0, u+v <= 1, t > 0 strictly."""
    db = Vec3(_bcast_rays(d.x), _bcast_rays(d.y), _bcast_rays(d.z))
    e2b = Vec3(_bcast_table(e2.x), _bcast_table(e2.y), _bcast_table(e2.z))
    h = cross(db, e2b)
    a = _bcast_table(e1.x) * h.x + _bcast_table(e1.y) * h.y + _bcast_table(e1.z) * h.z
    f = 1.0 / a
    s = Vec3(
        _bcast_rays(o.x) - _bcast_table(v0.x),
        _bcast_rays(o.y) - _bcast_table(v0.y),
        _bcast_rays(o.z) - _bcast_table(v0.z),
    )
    u = f * dot(s, h)
    e1b = Vec3(_bcast_table(e1.x), _bcast_table(e1.y), _bcast_table(e1.z))
    q = cross(s, e1b)
    v = f * dot(db, q)
    t = f * (_bcast_table(e2.x) * q.x + _bcast_table(e2.y) * q.y + _bcast_table(e2.z) * q.z)
    valid = (
        (a != 0.0)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > 0.0)
        & _bcast_table(active)
    )
    return t, valid


def intersect_triangles(o: Vec3, d: Vec3, tr: TrianglesSoA, chunk: int = 256):
    """(R,) rays x (Nt,) triangles -> per-ray (t_best, idx_best).

    Streams the triangle list in fixed-size chunks through a fori_loop with a
    running (t, argmin) carry — the ray x triangle analog of blockwise
    attention (SURVEY §5), keeping intermediates at (R, chunk)."""
    n_rays = o.x.shape[0]
    n_tris = tr.v0.x.shape[0]
    e1 = tr.v1 - tr.v0
    e2 = tr.v2 - tr.v0

    if n_tris <= chunk:
        t, valid = _tri_chunk(o, d, tr.v0, e1, e2, tr.active)
        t = jnp.where(valid, t, _INF)
        idx = jnp.argmin(t, axis=1).astype(jnp.int32)
        return jnp.min(t, axis=1), idx

    # pad triangle axis to a multiple of chunk with inactive slots
    pad = (-n_tris) % chunk
    def padv(v: Vec3) -> Vec3:
        return Vec3(*(jnp.pad(c, (0, pad)) for c in v))
    v0p, e1p, e2p = padv(tr.v0), padv(e1), padv(e2)
    act = jnp.pad(tr.active, (0, pad))
    n_chunks = (n_tris + pad) // chunk

    def body(i, carry):
        t_best, i_best = carry
        sl = lambda c: jax.lax.dynamic_slice_in_dim(c, i * chunk, chunk)
        slv = lambda v: Vec3(sl(v.x), sl(v.y), sl(v.z))
        t, valid = _tri_chunk(o, d, slv(v0p), slv(e1p), slv(e2p), sl(act))
        t = jnp.where(valid, t, _INF)
        local_idx = jnp.argmin(t, axis=1).astype(jnp.int32)
        local_t = jnp.min(t, axis=1)
        better = local_t < t_best
        return (
            jnp.where(better, local_t, t_best),
            jnp.where(better, local_idx + i * chunk, i_best),
        )

    init = (jnp.full((n_rays,), _INF), jnp.zeros((n_rays,), jnp.int32))
    t_best, i_best = jax.lax.fori_loop(0, n_chunks, body, init)
    return t_best, i_best


def barycentric_weights(v0: Vec3, v1: Vec3, v2: Vec3, p: Vec3):
    """Mirrors barycentric_weights (render.cl:223-241) including the
    (w2, w0, w1) result rotation.  Returns the weight triple (wx, wy, wz)
    to pair with vertex normals (n0, n1, n2) in that order."""
    return barycentric_weights_from_edges(v1 - v0, v2 - v0, p - v0)


def barycentric_weights_from_edges(a: Vec3, b: Vec3, c: Vec3):
    """barycentric_weights with the edge vectors precomputed (a = v1-v0,
    b = v2-v0, c = p-v0) — the BVH kernel returns edges, and the scene
    build computes them with the same f32 subtraction, so both paths are
    bit-identical."""
    d00 = dot(a, a)
    d01 = dot(a, b)
    d11 = dot(b, b)
    d20 = dot(c, a)
    d21 = dot(c, b)
    denom = d00 * d11 - d01 * d01
    w0 = (d11 * d20 - d01 * d21) / denom
    w1 = (d00 * d21 - d01 * d20) / denom
    w2 = 1.0 - w0 - w1
    return w2, w0, w1


def _tri_backend_auto(scene: DeviceScene) -> str:
    # Measured on TPU v5e: XLA's fused brute-force loop runs at ~54
    # Gtests/s (VPU-bound) and BEATS the blockwise Pallas kernel (~48) on
    # the same algorithm, so dense scenes keep the jnp path.  When the
    # scene build baked BVH clusters, the packet-culling kernel wins by
    # skipping work the dense path must execute (12x dense on config 4
    # primaries); it keeps the table VMEM-resident when it fits and
    # streams it from HBM otherwise.
    if scene.triangles.clusters is not None and jax.default_backend() == "tpu":
        return "bvh"
    return "jnp"


def resolve_compact_cap(n_rays: int, compact="auto"):
    """Shared compaction policy for the BVH call sites (the scan path
    here and the fused bounce path in ops/trace.py): `compact` is
    "auto" (size by compact_cap_auto), an int cap, or None/0 (off);
    the SRT_BVH_COMPACT env knob overrides for sweeps ("0" = off,
    "auto", or an int cap), read at trace time."""
    import os
    env = os.environ.get("SRT_BVH_COMPACT")
    if env is not None:
        compact = "auto" if env == "auto" else (int(env) or None)
    if compact == "auto":
        cap_env = os.environ.get("SRT_BVH_COMPACT_CAP")
        if cap_env:
            # sweep knob that sizes the cap WITHOUT flattening the
            # per-bounce policy (SRT_BVH_COMPACT=<int> would also force
            # compaction onto the peeled coherent bounce 0)
            return int(cap_env)
        from .pallas.bvh_kernel import compact_cap_auto
        return compact_cap_auto(n_rays)
    return compact or None


def closest_hit(scene: DeviceScene, o: Vec3, d: Vec3,
                tri_chunk: int = 256, tri_backend: str = "auto",
                alive: jnp.ndarray = None, compact=None) -> Hit:
    """Nearest hit across all primitive categories, with shading data.

    Equivalent to closest_intersection (render.cl:293-378): strict `<`
    keeps the earliest minimal t; across categories ties are resolved
    sphere < plane < triangle (the reference's order is shape-list insertion
    order; exact ties are measure-zero).

    tri_backend: "jnp" (fused XLA loop), "pallas" (blockwise TPU kernel),
    "bvh" (VMEM-resident packet-culling TPU kernel), "clustered" (HBM/DMA
    packet-culling TPU kernel), or "auto".  `alive` is an optional (R,)
    bool mask letting the culling kernels skip fully-dead ray blocks.
    `compact` routes the BVH backends through the sparse-bounce ray
    compaction (see intersect_triangles_bvh_compact / resolve_compact_cap);
    live-ray results are bit-identical either way.  Default None (off) —
    the CALLER owns the policy because it is bounce-dependent: coherent
    all-alive camera rays lose under compaction (the sort/gather/scatter
    costs more than the dense kernel's tile-coherent early exit leaves on
    the table; 21.9 vs 14.1 ms measured on the 82K-tri bench bounce 0),
    sparse secondary bounces win big (59.6 -> 38.7 ms bounce 1,
    scripts/bench_compact_parts.py), so trace_rays peels bounce 0 dense
    and passes compact="auto" for bounces >= 1.  SRT_BVH_COMPACT
    overrides everywhere for sweeps."""
    if tri_backend == "auto":
        tri_backend = _tri_backend_auto(scene)
    inf = jnp.full_like(o.x, jnp.inf)
    zero_i = jnp.zeros(o.x.shape, jnp.int32)
    # empty primitive categories have zero-capacity arrays (a STATIC
    # property under jit), so their whole intersection cost vanishes
    has_spheres = scene.spheres.radius.shape[0] > 0
    has_planes = scene.planes.material.shape[0] > 0
    has_tris = scene.triangles.material.shape[0] > 0
    if has_spheres:
        t_s, i_s = intersect_spheres(o, d, scene.spheres)
    else:
        t_s, i_s = inf, zero_i
    if has_planes:
        t_p, i_p = intersect_planes(o, d, scene.planes)
    else:
        t_p, i_p = inf, zero_i
    tri_attrs = n_tri_pre = tri_mat_pre = None
    if not has_tris:
        t_t, i_t = inf, zero_i
    elif tri_backend in ("bvh", "clustered") \
            and scene.triangles.clusters is not None:
        from .pallas.bvh_kernel import intersect_triangles_bvh
        alive_f = (jnp.ones_like(o.x) if alive is None
                   else alive.astype(jnp.float32))
        cl = scene.triangles.clusters
        # seed the slab far bound with the best sphere/plane hit so
        # clusters behind a known hit are culled (render.cl:319 semantics)
        t_seed = jnp.minimum(t_s, t_p)
        # "clustered" (the round-1 backend name) forces the HBM/DMA table
        # placement; "bvh" lets the kernel pick by table size
        from .pallas.bvh_kernel import (maybe_sub_aabb,
                                        intersect_triangles_bvh_compact)
        sub, sdiv = maybe_sub_aabb(cl)
        cap = resolve_compact_cap(o.x.shape[0], compact)
        kw = dict(hbm_table=True if tri_backend == "clustered" else None,
                  table_tr=cl.table_tr, sub_aabb=sub, sub_div=sdiv)
        if cap:
            # compact route: the barycentric/material tail already ran
            # in compact space (bvh_kernel._compact_shade) — only
            # (t, normal, material) come back at full R
            t_t, n_tri_pre, tri_mat_pre = intersect_triangles_bvh_compact(
                o, d, alive_f, t_seed, cl.aabb, cl.table_t, cap=cap,
                shaded=True, **kw)
            i_t = jnp.zeros_like(o.x, jnp.int32)
        else:
            t_t, i_t, tri_attrs = intersect_triangles_bvh(
                o, d, alive_f, t_seed, cl.aabb, cl.table_t,
                with_attrs=True, **kw)
        i_t = jnp.maximum(i_t, 0)   # -1 (no win) -> any index; t is +inf
    elif tri_backend == "pallas":
        from .pallas.triangle_kernel import (intersect_triangles_pallas,
                                             pack_triangles)
        t_t, i_t = intersect_triangles_pallas(o, d,
                                              pack_triangles(scene.triangles))
    else:
        t_t, i_t = intersect_triangles(o, d, scene.triangles, chunk=tri_chunk)

    t = jnp.minimum(jnp.minimum(t_s, t_p), t_t)
    hit = jnp.isfinite(t)
    is_s = t_s == t
    is_p = (~is_s) & (t_p == t)

    position = o + d * t

    # All winner-attribute fetches go through ops.gather in TRANSPOSED
    # (F, R) orientation (one-hot MXU matmul for small tables / row gather
    # + transpose for big ones): per-component dynamic gathers from
    # jit-argument tables are element-serial on TPU, and (R, F) results'
    # column slices each re-scan the lane-padded buffer.
    from .gather import table_gather_t

    # sphere shading: n = (pos - center) / radius   (render.cl:311-312)
    if has_spheres:
        sph_tab = jnp.stack([scene.spheres.center.x, scene.spheres.center.y,
                             scene.spheres.center.z, scene.spheres.radius,
                             scene.spheres.material.astype(jnp.float32)],
                            axis=-1)
        srow = table_gather_t(sph_tab, i_s)
        n_sph = (position - Vec3(srow[0], srow[1], srow[2])) / srow[3]
        sph_material = srow[4]
    else:
        n_sph = Vec3(inf, inf, inf)
        sph_material = jnp.zeros_like(o.x)

    # plane shading: n = plane normal               (render.cl:360-362)
    if has_planes:
        pln_tab = jnp.stack([scene.planes.normal.x, scene.planes.normal.y,
                             scene.planes.normal.z,
                             scene.planes.material.astype(jnp.float32)],
                            axis=-1)
        prow = table_gather_t(pln_tab, i_p)
        n_pln = Vec3(prow[0], prow[1], prow[2])
        pln_material = prow[3]
    else:
        n_pln = Vec3(inf, inf, inf)
        pln_material = jnp.zeros_like(o.x)

    # triangle shading: smooth barycentric normals  (render.cl:339-343);
    # packed (T, 20) shade table: 18 vertex attrs + material index
    if not has_tris:
        normal = vwhere(is_s, n_sph, n_pln)
        material = jnp.where(is_s, sph_material, pln_material
                             ).astype(jnp.int32)
        front = dot(normal, d) < 0.0
        normal = normal * jnp.where(front, 1.0, -1.0)
        return Hit(hit=hit, t=t, position=position, normal=normal,
                   front=front, material=material)
    if n_tri_pre is not None:
        # compact route: shading tail already evaluated in compact space
        # (values bit-identical to the branch below for winning rays)
        n_tri, tri_material = n_tri_pre, tri_mat_pre
    elif tri_attrs is not None:
        # winner attributes came straight out of the BVH kernel as dense
        # (19, R) rows: [v0, e1, e2, n0, n1, n2, material]
        tv0 = Vec3(tri_attrs[0], tri_attrs[1], tri_attrs[2])
        ea = Vec3(tri_attrs[3], tri_attrs[4], tri_attrs[5])
        eb = Vec3(tri_attrs[6], tri_attrs[7], tri_attrs[8])
        wx, wy, wz = barycentric_weights_from_edges(ea, eb, position - tv0)
        n_tri = (Vec3(tri_attrs[9], tri_attrs[10], tri_attrs[11]) * wx
                 + Vec3(tri_attrs[12], tri_attrs[13], tri_attrs[14]) * wy
                 + Vec3(tri_attrs[15], tri_attrs[16], tri_attrs[17]) * wz)
        n_tri = normalize(n_tri)
        tri_material = tri_attrs[18]
    else:
        trow = table_gather_t(scene.triangles.shade, i_t)   # (20, R)
        tv0 = Vec3(trow[0], trow[1], trow[2])
        tv1 = Vec3(trow[3], trow[4], trow[5])
        tv2 = Vec3(trow[6], trow[7], trow[8])
        wx, wy, wz = barycentric_weights(tv0, tv1, tv2, position)
        n_tri = (Vec3(trow[9], trow[10], trow[11]) * wx
                 + Vec3(trow[12], trow[13], trow[14]) * wy
                 + Vec3(trow[15], trow[16], trow[17]) * wz)
        n_tri = normalize(n_tri)
        tri_material = trow[18]

    normal = vwhere(is_s, n_sph, vwhere(is_p, n_pln, n_tri))
    material = jnp.where(
        is_s, sph_material,
        jnp.where(is_p, pln_material, tri_material),
    ).astype(jnp.int32)

    # flip normal toward the ray (render.cl:372-375)
    front = dot(normal, d) < 0.0
    normal = normal * jnp.where(front, 1.0, -1.0)

    return Hit(hit=hit, t=t, position=position, normal=normal,
               front=front, material=material)
