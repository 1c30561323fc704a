"""VMEM-resident BVH kernel (bvh_kernel.py) parity vs the dense jnp path.

Runs the kernel in interpret mode on the CPU mesh; the same assertions
hold compiled on TPU (checked bit-exact in round-2 bring-up)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.ops.intersect import intersect_triangles
from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
    _N_ATTRS, intersect_triangles_bvh)
from simple_raytracer_tpu.ops.vec import Vec3


def _mesh_scene(cluster_size=128, subbox=False):
    pos, nrm = icosphere(subdivisions=2)  # 320 tris
    sc = Scene()
    sc.cluster_threshold = 64
    sc.cluster_size = cluster_size
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    if subbox:
        # sub_aabb is only built under its opt-in knob (see Scene.build)
        os.environ["SRT_BVH_SUBBOX"] = "8"
        try:
            return sc.build()
        finally:
            del os.environ["SRT_BVH_SUBBOX"]
    return sc.build()


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d)))


def test_bvh_matches_dense():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    assert cl is not None and cl.table_t is not None
    o, d = _rays(700)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                       cl.table_t, block_r=128,
                                       interpret=True)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.asarray(i_k) >= 0)
    # CPU interpret mode and the dense XLA path contract FMAs differently
    # (1-ulp t differences); compiled on TPU the two are bit-exact
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_k)[hit],
                                  np.asarray(i_ref)[hit])


@pytest.mark.parametrize("variant", ["packed_vmem", "hbm_packed"])
def test_bvh_k256_two_packet_table_matches_dense(variant):
    """K=256 clusters pack as TWO (24, 128) packets per cluster
    (TriangleClustersSoA.table_tr is (C, 48, 128)); both packed kernel
    forms must agree with the dense reference, winner indices included.
    Guards the multi-packet transpose/MT loop in _kernel_packed /
    _kernel_hbm and the packet-aware VMEM budget."""
    ds = _mesh_scene(cluster_size=256)
    cl = ds.triangles.clusters
    assert cl.table_tr is not None and cl.table_tr.shape[1] == 48
    o, d = _rays(700)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    kw = dict(block_r=128, interpret=True, table_tr=cl.table_tr)
    if variant == "packed_vmem":
        kw["packed_vmem"] = True
    else:
        kw["hbm_table"] = True
    t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                       cl.table_t, **kw)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.asarray(i_k) >= 0)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_k)[hit],
                                  np.asarray(i_ref)[hit])


def test_bvh_t_init_culls_but_preserves_closer_hits():
    """With a finite t_init, hits beyond it are suppressed and hits closer
    than it are reported identically."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(512, seed=3)
    alive = jnp.ones_like(o.x)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    t_ref_np = np.asarray(t_ref)
    t_init = jnp.full_like(o.x, 2.0)
    t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                       cl.table_t, block_r=128,
                                       interpret=True)
    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    wins = t_ref_np < 2.0
    np.testing.assert_array_equal(wins, i_k >= 0)
    np.testing.assert_allclose(t_k[wins], t_ref_np[wins], rtol=1e-5)
    assert np.isinf(t_k[~wins]).all()


def test_bvh_winner_attributes_match_table():
    """with_attrs returns exactly the winning triangle's shading row."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(384, seed=5)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    t_k, i_k, attrs = intersect_triangles_bvh(
        o, d, alive, t_init, cl.aabb, cl.table_t, block_r=128,
        interpret=True, with_attrs=True)
    i_k = np.asarray(i_k)
    attrs = np.asarray(attrs)
    assert attrs.shape == (_N_ATTRS, o.x.shape[0])
    table_t = np.asarray(cl.table_t)
    hit = i_k >= 0
    # table rows are keyed by global triangle index (column 20)
    gidx = table_t[:, 20].astype(np.int64)
    act = table_t[:, 19] > 0
    row_of = {g: r for r, g in enumerate(gidx) if act[r]}
    for r in np.nonzero(hit)[0][:50]:
        np.testing.assert_array_equal(attrs[:, r],
                                      table_t[row_of[i_k[r]], :_N_ATTRS])


def test_bvh_dead_rays_no_win():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(256)
    alive = jnp.zeros_like(o.x)
    t_k, i_k = intersect_triangles_bvh(o, d, alive,
                                       jnp.full_like(o.x, jnp.inf),
                                       cl.aabb, cl.table_t, block_r=128,
                                       interpret=True)
    assert np.isinf(np.asarray(t_k)).all()
    assert (np.asarray(i_k) == -1).all()


def test_bvh_rays_from_inside_mesh():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    rng = np.random.default_rng(9)
    o_arr = rng.normal(size=(300, 3)).astype(np.float32)
    o_arr /= np.linalg.norm(o_arr, axis=1, keepdims=True)
    d_arr = rng.normal(size=(300, 3)).astype(np.float32)
    d_arr /= np.linalg.norm(d_arr, axis=1, keepdims=True)
    o = Vec3.from_array(jnp.asarray(o_arr * 0.999))
    d = Vec3.from_array(jnp.asarray(d_arr))
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_k, i_k = intersect_triangles_bvh(o, d, alive,
                                       jnp.full_like(o.x, jnp.inf),
                                       cl.aabb, cl.table_t, block_r=128,
                                       interpret=True)
    t_ref, t_k = np.asarray(t_ref), np.asarray(t_k)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit, np.isfinite(t_k))
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5)


@pytest.mark.parametrize("prepass_level", ["super", "group"])
@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("with_attrs", [False, True])
def test_hbm_variant_matches_vmem(with_attrs, packed, prepass_level):
    """The HBM/DMA double-buffered path returns exactly what the
    VMEM-resident path returns — in both streaming forms: row tiles
    (table_t) and packed transposed tiles (table_tr, the 96 B/triangle
    layout the product path uses)."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    assert cl.table_tr is not None
    o, d = _rays(700, seed=7)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    a = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=with_attrs, hbm_table=False)
    b = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=with_attrs, hbm_table=True,
                                table_tr=cl.table_tr if packed else None,
                                prepass_level=prepass_level)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (np.asarray(a[1]) >= 0).any()   # some triangle wins exercised


def test_hbm_packed_k64_matches_vmem():
    """K=64 clusters fill only half the packed tile's lanes (the rest
    carry active=0) — the streaming kernel must still match the VMEM
    path bit-exactly."""
    pos, nrm = icosphere(subdivisions=2)
    sc = Scene()
    sc.cluster_threshold = 64
    sc.cluster_size = 64
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    ds = sc.build()
    cl = ds.triangles.clusters
    assert cl.table_t.shape[0] // cl.aabb.shape[0] == 64
    o, d = _rays(512, seed=13)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    a = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=True, hbm_table=False)
    b = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=True, hbm_table=True,
                                table_tr=cl.table_tr)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("prepass_level", ["super", "group"])
@pytest.mark.parametrize("with_attrs", [False, True])
def test_packed_vmem_matches_vmem(with_attrs, prepass_level):
    """The VMEM-resident PACKED-table path (no DMA: whole table_tr rides
    VMEM, per-sub-block gated MT straight off aligned slices + one MXU
    transpose per visit) returns exactly what the row-VMEM path returns,
    under both prepass levels and with a finite t_init seed mixed in."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    assert cl.table_tr is not None
    o, d = _rays(700, seed=21)
    alive = jnp.ones_like(o.x)
    t_init = jnp.where(o.x > 0, 2.0, jnp.inf).astype(jnp.float32)
    a = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=with_attrs, hbm_table=False)
    b = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb, cl.table_t,
                                block_r=128, interpret=True,
                                with_attrs=with_attrs,
                                table_tr=cl.table_tr, packed_vmem=True,
                                prepass_level=prepass_level)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (np.asarray(a[1]) >= 0).any()


@pytest.mark.parametrize("cluster_size", [128, 256])
@pytest.mark.parametrize("variant", ["packed_vmem", "hbm_packed"])
@pytest.mark.parametrize("with_attrs", [False, True])
def test_plucker_matches_dense(with_attrs, variant, cluster_size,
                               monkeypatch):
    """SRT_BVH_MT=plucker (the MXU bilinear Moller-Trumbore form) agrees
    with the dense reference: identical hit masks and winner indices,
    t within f32-reassociation rounding (u*a, v*a, a, t*a evaluated as
    Pluecker dot products instead of the cross-product chain).  The env
    knob is read at trace time, so the jit cache is cleared around it.
    cluster_size=256 exercises the multi-packet per-cluster LT loop."""
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    ds = _mesh_scene(cluster_size=cluster_size)
    cl = ds.triangles.clusters
    assert cl.table_tr is not None
    o, d = _rays(700, seed=33)
    alive = jnp.ones_like(o.x)
    t_init = jnp.where(o.x > 0, 2.0, jnp.inf).astype(jnp.float32)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    monkeypatch.setenv("SRT_BVH_MT", "plucker")
    assert bk._mt_form() == "plucker"
    intersect_triangles_bvh.clear_cache()
    traces_before = bk._PLUCKER_TRACES
    try:
        kw = dict(packed_vmem=True) if variant == "packed_vmem" \
            else dict(hbm_table=True)
        res = intersect_triangles_bvh(
            o, d, alive, t_init, cl.aabb, cl.table_t, block_r=128,
            interpret=True, with_attrs=with_attrs, table_tr=cl.table_tr,
            **kw)
    finally:
        intersect_triangles_bvh.clear_cache()
    # prove the MXU form actually traced — a silent fallback to "mt"
    # would pass every numeric assertion below (advisor finding, r3)
    assert bk._PLUCKER_TRACES > traces_before
    t_ref = np.asarray(t_ref)
    wins = np.isfinite(t_ref) & (t_ref < np.asarray(t_init))
    np.testing.assert_array_equal(wins, np.asarray(res[1]) >= 0)
    # u*a = d.(v0 x e2) + m.e2 subtracts two dot products that each can
    # exceed the result by ~|o|/|o - v0|, so near hits lose a few more
    # bits than the cross-product chain (observed max 1.3e-5 relative on
    # this fixture, at t = 0.02); winners and hit masks still agree
    # exactly, and the product path is anchored by the scan-path RMSE
    # bound regardless
    np.testing.assert_allclose(np.asarray(res[0])[wins], t_ref[wins],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(res[1])[wins],
                                  np.asarray(i_ref)[wins])
    assert wins.any()
    if with_attrs:
        table = np.asarray(cl.table_t)
        gidx = table[:, 20].astype(np.int64)
        row_of = {g: r for r, g in enumerate(gidx) if table[r, 19] > 0}
        i_k = np.asarray(res[1])
        for r in np.flatnonzero(wins)[:32]:
            np.testing.assert_array_equal(
                np.asarray(res[2])[:, r], table[row_of[i_k[r]], :_N_ATTRS])


def test_packed_vmem_auto_selected_for_mid_tables(monkeypatch):
    """A table too big for row-VMEM residence but packed-small selects
    the packed-VMEM path automatically (no DMA kernel), and the result
    still matches the dense reference."""
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    # force the row table (384 slots here) over the row-VMEM limit so
    # auto-selection must pick between HBM streaming and packed-VMEM
    monkeypatch.setattr(bk, "VMEM_TABLE_MAX_SLOTS", 128)
    o, d = _rays(320, seed=5)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    # block_r=256 also keeps this call's jit cache key unique, so the
    # monkeypatched limit is seen at trace time rather than a cached
    # trace from another test
    t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                       cl.table_t, block_r=256,
                                       interpret=True,
                                       table_tr=cl.table_tr)
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(hit, np.asarray(i_k) >= 0)
    np.testing.assert_allclose(np.asarray(t_k)[hit],
                               np.asarray(t_ref)[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_k)[hit],
                                  np.asarray(i_ref)[hit])


def test_packed_table_layout():
    """table_tr holds exactly table_t's 21 attribute columns, transposed
    per cluster (attributes on sublanes, triangles on lanes)."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    tt = np.asarray(cl.table_t)
    tr = np.asarray(cl.table_tr)
    c = cl.aabb.shape[0]
    k = tt.shape[0] // c
    assert tr.shape == (c, 24, 128)
    np.testing.assert_array_equal(
        tr[:, :21, :k], tt.reshape(c, k, 128)[:, :, :21].transpose(0, 2, 1))
    assert (tr[:, 21:, :] == 0).all() and (tr[:, :, k:] == 0).all()


@pytest.mark.parametrize("sort_rays", [False, True])
def test_hbm_sorted_compaction_matches_unsorted(sort_rays):
    """The per-bounce coherence sort (sort rays by first-hit supercluster
    rank, run the kernel on the permuted batch, unsort the outputs) is a
    pure permutation: LIVE rays get identical results in caller ray order
    either way, including winner attributes.  Dead rays are compared only
    for the no-spurious-win contract: `alive` gates visit generation at
    block granularity, so an unsorted dead ray sharing a block with live
    rays may incidentally report a hit, while the sort compacts dead rays
    into skipped blocks — callers ignore dead-ray outputs either way."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(640, seed=11)
    alive = (jnp.arange(640) % 5 != 0).astype(jnp.float32)  # some dead
    t_init = jnp.where(jnp.arange(640) % 7 == 0, 2.0, jnp.inf)
    base = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                   cl.table_t, block_r=128, interpret=True,
                                   with_attrs=True, hbm_table=False)
    got = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                  cl.table_t, block_r=128, interpret=True,
                                  with_attrs=True, hbm_table=True,
                                  sort_rays=sort_rays)
    live = np.asarray(alive) > 0
    for x, y in zip(base, got):
        np.testing.assert_array_equal(np.asarray(x)[..., live],
                                      np.asarray(y)[..., live])
    # dead rays: idx decodes cleanly (no NaN-canonicalization corruption)
    dead_idx = np.asarray(got[1])[~live]
    assert ((dead_idx == -1) | (dead_idx >= 0)).all()


def test_hbm_variant_with_t_init_and_dead_rays():
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(512, seed=8)
    t_ref, _ = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_k, i_k = intersect_triangles_bvh(o, d, alive,
                                       jnp.full_like(o.x, 2.0),
                                       cl.aabb, cl.table_t, block_r=128,
                                       interpret=True, hbm_table=True)
    wins = np.asarray(t_ref) < 2.0
    np.testing.assert_array_equal(wins, np.asarray(i_k) >= 0)
    t_k, i_k = intersect_triangles_bvh(o, d, jnp.zeros_like(o.x),
                                       jnp.full_like(o.x, jnp.inf),
                                       cl.aabb, cl.table_t, block_r=128,
                                       interpret=True, hbm_table=True)
    assert (np.asarray(i_k) == -1).all()


def test_scene_build_table_t_layout():
    """Scene.build bakes the documented column layout into table_t."""
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    tt = np.asarray(cl.table_t)
    assert tt.shape[1] == 128
    act = tt[:, 19] > 0
    gidx = tt[act, 20].astype(np.int64)
    v0 = np.stack([np.asarray(ds.triangles.v0.x), np.asarray(ds.triangles.v0.y),
                   np.asarray(ds.triangles.v0.z)], axis=-1)
    v1 = np.stack([np.asarray(ds.triangles.v1.x), np.asarray(ds.triangles.v1.y),
                   np.asarray(ds.triangles.v1.z)], axis=-1)
    n0x = np.asarray(ds.triangles.n0.x)
    np.testing.assert_array_equal(tt[act, 0:3], v0[gidx])
    np.testing.assert_array_equal(tt[act, 3:6], (v1 - v0)[gidx])
    np.testing.assert_array_equal(tt[act, 9], n0x[gidx])
    np.testing.assert_array_equal(
        tt[act, 18], np.asarray(ds.triangles.material)[gidx].astype(np.float32))


def test_end_to_end_bvh_render_matches_jnp():
    """Full render through the engine: bvh backend == jnp backend
    (bit-exact — same formulas, same f32 inputs)."""
    from simple_raytracer_tpu import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import config4_mesh_glass

    scene, camera, _ = config4_mesh_glass(width=48, height=32)
    opts_j = RenderOptions(width=48, height=32, num_samples=1, num_bounces=3,
                           tri_backend="jnp")
    r1 = Renderer(opts_j, scene=scene)
    r1.step(camera, time=9)

    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    orig = bk.intersect_triangles_bvh

    def interp(o, d, alive, t_init, aabb, table_t, block_r=1536,
               interpret=False, with_attrs=False, hbm_table=None, **kw):
        return orig(o, d, alive, t_init, aabb, table_t, block_r=128,
                    interpret=True, with_attrs=with_attrs,
                    hbm_table=hbm_table, **kw)

    bk.intersect_triangles_bvh = interp
    try:
        opts_b = RenderOptions(width=48, height=32, num_samples=1,
                               num_bounces=3, tri_backend="bvh")
        r2 = Renderer(opts_b, scene=scene)
        r2.step(camera, time=9)
    finally:
        bk.intersect_triangles_bvh = orig

    a, b = np.asarray(r1.canvas), np.asarray(r2.canvas)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


def test_equal_t_tie_across_clusters_picks_lowest_index():
    """Two IDENTICAL triangles placed in different clusters must resolve
    an exact-equal t to the lowest global index on both kernel paths —
    the dense path's argmin (first minimum) semantics.  Traversal order
    is a camera-dependent heuristic, so a strict < commit would let the
    winner flicker with the live-ray set."""
    import jax.numpy as jnp
    C, K = 2, 8
    table = np.zeros((C * K, 128), np.float32)

    def put(slot, gidx):
        # unit right triangle at z = -2: v0=(-1,-1), e1=(2,0), e2=(0,2)
        table[slot, 0:3] = [-1.0, -1.0, -2.0]
        table[slot, 3:6] = [2.0, 0.0, 0.0]
        table[slot, 6:9] = [0.0, 2.0, 0.0]
        table[slot, 9:18] = [0, 0, 1, 0, 0, 1, 0, 0, 1]
        table[slot, 19] = 1.0
        table[slot, 20] = gidx

    put(0, 5.0)        # cluster 0 (visited first): HIGHER index
    put(K, 2.0)        # cluster 1: duplicate with LOWER index
    aabb = np.zeros((C, 8), np.float32)
    aabb[:, 0:3] = [-1.0, -1.0, -2.0]
    aabb[:, 3:6] = [1.0, 1.0, -2.0]

    n = 128
    o = Vec3.from_array(jnp.zeros((n, 3), jnp.float32))
    d = Vec3.from_array(jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]],
                                             jnp.float32), (n, 1)))
    alive = jnp.ones((n,), jnp.float32)
    t_init = jnp.full((n,), jnp.inf, jnp.float32)

    for hbm in (False, True):
        t_k, i_k = intersect_triangles_bvh(
            o, d, alive, t_init, jnp.asarray(aabb), jnp.asarray(table),
            block_r=128, interpret=True, hbm_table=hbm)
        np.testing.assert_allclose(np.asarray(t_k), 2.0, rtol=1e-6)
        assert (np.asarray(i_k) == 2).all(), f"hbm_table={hbm}"


def test_flat_axis_aligned_mesh_is_not_culled():
    """A planar axis-aligned mesh produces perfectly FLAT cluster AABBs
    (near == far at the hit): the closed-interval slab gate must still
    visit them.  The reference's strict tmin < tmax only ever gates
    whole models (rarely flat); clusters subdivide meshes, which
    routinely are (floor grids, cube faces)."""
    import jax.numpy as jnp
    # 16x16 grid of quads at y = 0 -> 512 triangles, all coplanar
    g = 16
    xs = np.linspace(-2, 2, g + 1, dtype=np.float32)
    quads = []
    for i in range(g):
        for j in range(g):
            x0, x1 = xs[i], xs[i + 1]
            z0, z1 = xs[j], xs[j + 1]
            quads.append([[x0, 0, z0], [x1, 0, z0], [x0, 0, z1]])
            quads.append([[x1, 0, z0], [x1, 0, z1], [x0, 0, z1]])
    pos = np.asarray(quads, np.float32)
    nrm = np.tile(np.asarray([0, 1, 0], np.float32), (pos.shape[0], 3, 1))

    sc = Scene()
    sc.cluster_threshold = 64
    sc.cluster_size = 128
    span = sc.pool.append(pos, nrm)
    sc.add_model(span)
    ds = sc.build()
    cl = ds.triangles.clusters
    assert cl is not None
    # every cluster box is exactly flat in y
    assert (np.asarray(cl.aabb)[:, 1] == np.asarray(cl.aabb)[:, 4]).all()

    o, d = _rays(600, seed=9)
    t_ref, i_ref = intersect_triangles(o, d, ds.triangles, chunk=4096)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)
    t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                       cl.table_t, block_r=128,
                                       interpret=True)
    hit = np.isfinite(np.asarray(t_ref))
    assert hit.any()            # the random rays do hit the plane
    np.testing.assert_array_equal(hit, np.asarray(i_k) >= 0)
    np.testing.assert_allclose(np.asarray(t_k)[hit],
                               np.asarray(t_ref)[hit], rtol=1e-5)


def test_sentinel_boxes_never_visited_by_sky_rays():
    """Bucket-padding sentinels (every plane at +3e38) must not be
    visited: under the closed-interval gate a no-hit ray into the
    all-positive octant gets near == far == +inf on a far point box
    (or exactly-equal finite products on the diagonal), which without
    the near >= 1e38 term counts as a hit — every sky ray would then
    visit every sentinel (and on the two-level HBM path, DMA rows that
    do not exist)."""
    import jax.numpy as jnp
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import _visit_prepass

    aabb = np.zeros((2, 8), np.float32)
    aabb[0, 0:3] = [-1, -1, -6]
    aabb[0, 3:6] = [1, 1, -4]          # real box in front (-z)
    aabb[1, 0:6] = 3.0e38              # sentinel

    n = 128
    # half the rays stare at the real box, half fly into +x+y+z sky
    # (incl. the exact diagonal from the origin — equal finite products)
    d = np.zeros((n, 3), np.float32)
    d[: n // 2] = [0, 0, -1]
    d[n // 2:] = 1.0 / np.sqrt(3.0)
    o = np.zeros((n, 3), np.float32)
    ov = Vec3.from_array(jnp.asarray(o))
    dv = Vec3.from_array(jnp.asarray(d))
    alive = jnp.ones((n,), jnp.float32)
    t_init = jnp.full((n,), jnp.inf, jnp.float32)

    visits, counts = _visit_prepass(ov, dv, alive, t_init,
                                    jnp.asarray(aabb), n, 0)
    word = int(np.asarray(visits)[0, 0])
    assert word & 1, "real box must be visited"
    assert not (word & 2), "sentinel must be culled"
    assert int(np.asarray(counts)[0]) == 1


def test_nan_ray_is_conservative_and_in_bounds():
    """A ray whose state went NaN visits everything by design (NaN slab
    results count as hits); on the HBM paths the DMA index clamp keeps
    even those visits inside the table, and every NON-NaN ray's result
    is unaffected."""
    import jax.numpy as jnp
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    o, d = _rays(256, seed=5)
    # poison ray 0
    ox = np.asarray(o.x).copy(); ox[0] = np.nan
    o = Vec3(jnp.asarray(ox), o.y, o.z)
    alive = jnp.ones_like(o.x)
    t_init = jnp.full_like(o.x, jnp.inf)

    t_ref, i_ref = intersect_triangles(
        Vec3(o.x[1:], o.y[1:], o.z[1:]),
        Vec3(d.x[1:], d.y[1:], d.z[1:]), ds.triangles, chunk=4096)

    for kw in ({"hbm_table": False},
               {"hbm_table": True},
               {"hbm_table": True, "table_tr": cl.table_tr},
               {"hbm_table": True, "table_tr": cl.table_tr,
                "prepass_level": "group"}):
        t_k, i_k = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                           cl.table_t, block_r=128,
                                           interpret=True, **kw)
        t_k, i_k = np.asarray(t_k)[1:], np.asarray(i_k)[1:]
        hit = np.isfinite(np.asarray(t_ref))
        np.testing.assert_array_equal(hit, i_k >= 0, err_msg=str(kw))
        np.testing.assert_allclose(t_k[hit], np.asarray(t_ref)[hit],
                                   rtol=1e-5, err_msg=str(kw))


@pytest.mark.parametrize("sub_div", [2, 4, 8])
@pytest.mark.parametrize("variant", ["packed_vmem", "hbm_packed",
                                     "hbm_rows"])
def test_subbox_gating_is_bit_identical(variant, sub_div):
    """The fourth culling level (per-cluster sub-boxes gating MT to
    (K/8, 128) sub-tiles — TriangleClustersSoA.sub_aabb) is a pure
    skip-provably-unreachable-work optimization: every kernel variant
    returns bit-identical (t, idx, attrs) for LIVE rays with and
    without it, under a mixed finite t_init seed.  Dead rays are
    unspecified either way (the sub-box word masks them out, so a dead
    ray sharing a block with live rays may see fewer incidental
    commits); assert only the decodes-cleanly contract for them."""
    ds = _mesh_scene(subbox=True)
    cl = ds.triangles.clusters
    assert cl.sub_aabb is not None          # K=128 + knob -> built
    assert cl.sub_aabb.shape == (cl.aabb.shape[0] * 8, 8)
    o, d = _rays(640, seed=31)
    alive = (jnp.arange(640) % 9 != 0).astype(jnp.float32)
    t_init = jnp.where(jnp.arange(640) % 5 == 0, 2.5, jnp.inf)
    kw = dict(block_r=128, interpret=True, with_attrs=True)
    if variant == "packed_vmem":
        kw.update(table_tr=cl.table_tr, packed_vmem=True)
    elif variant == "hbm_packed":
        kw.update(hbm_table=True, table_tr=cl.table_tr)
    else:
        kw.update(hbm_table=True)
    base = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                   cl.table_t, **kw)
    got = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                  cl.table_t, sub_aabb=cl.sub_aabb,
                                  sub_div=sub_div, **kw)
    live = np.asarray(alive) > 0
    for x, y in zip(base, got):
        np.testing.assert_array_equal(np.asarray(x)[..., live],
                                      np.asarray(y)[..., live])
    assert (np.asarray(got[1]) >= 0).any()
    dead_idx = np.asarray(got[1])[~live]
    assert ((dead_idx == -1) | (dead_idx >= 0)).all()


def test_plucker_knob_warns_when_gated_off(monkeypatch):
    """SRT_BVH_MT=plucker combined with conditions that force the VPU
    form (sub-box gating on, or an unpacked table) warns instead of
    silently measuring 'mt' (advisor finding, round 3)."""
    import warnings
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk
    monkeypatch.setenv("SRT_BVH_MT", "plucker")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert bk._resolve_plucker(True, sub_rows=16) is False
        assert bk._resolve_plucker(False, sub_rows=0) is False
    assert len(rec) == 2
    assert "sub-box gating" in str(rec[0].message)
    assert "not packed" in str(rec[1].message)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert bk._resolve_plucker(True, sub_rows=0) is True
        monkeypatch.setenv("SRT_BVH_MT", "mt")
        assert bk._resolve_plucker(False, sub_rows=16) is False
    assert rec == []


def test_scene_build_sub_aabb_bounds_slots():
    """sub_aabb sub-box j of cluster c bounds exactly the valid
    triangles in slot range [j*K/8, (j+1)*K/8); all-padding ranges are
    far-point sentinels (>= 1e38) the slab gates cull."""
    ds = _mesh_scene(subbox=True)
    cl = ds.triangles.clusters
    sub = np.asarray(cl.sub_aabb)
    tab = np.asarray(cl.table_t)
    c_n = cl.aabb.shape[0]
    k = tab.shape[0] // c_n
    for c in range(c_n):
        rows = tab[c * k:(c + 1) * k]
        for j in range(8):
            r = rows[j * (k // 8):(j + 1) * (k // 8)]
            r = r[r[:, 19] > 0]
            box = sub[c * 8 + j]
            if len(r) == 0:
                assert (box[0:6] >= 1e38).all()
                continue
            verts = np.stack([r[:, 0:3],
                              r[:, 0:3] + r[:, 3:6],
                              r[:, 0:3] + r[:, 6:9]], axis=1)
            lo, hi = verts.reshape(-1, 3).min(0), verts.reshape(-1, 3).max(0)
            np.testing.assert_allclose(box[0:3], lo, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(box[3:6], hi, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sort_key", ["super", "morton"])
@pytest.mark.parametrize("with_attrs", [False, True])
@pytest.mark.parametrize("scenario", ["compacted", "overflow", "mixed"])
def test_compact_wrapper_matches_dense(with_attrs, scenario, sort_key):
    """intersect_triangles_bvh_compact is bit-identical to the dense
    kernel in BOTH cond branches: "compacted" aims most rays away from
    the mesh (admitting count fits the cap -> the sparse fast path
    runs), "overflow" aims every ray at it with a cap far below the ray
    count (the lax.cond dense fallback runs), "mixed" adds dead rays,
    finite t_init seeds and NaN-prone zero-component directions to the
    compacted case.  Interpret mode on CPU; the dense kernel itself is
    pinned against the jnp path elsewhere (test_bvh_matches_dense)."""
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        intersect_triangles_bvh_compact)
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    n = 1024
    rng = np.random.default_rng(11)
    o_np = rng.uniform(2.5, 3.5, (n, 3)).astype(np.float32)
    to_mesh = -o_np + rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    away = o_np + rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    if scenario == "overflow":
        d_np, cap = to_mesh, 128                 # every ray admits
    else:
        # ~1/8 of rays can touch the mesh; the rest look away
        aimed = rng.random(n) < 0.125
        d_np = np.where(aimed[:, None], to_mesh, away)
        cap = 512
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    alive = np.ones((n,), np.float32)
    t_init = np.full((n,), np.inf, np.float32)
    if scenario == "mixed":
        alive[::7] = 0.0                         # dead rays stay misses
        t_init[::3] = 2.0                        # sphere/plane seeds
        d_np[::5, 1] = 0.0                       # 1/d = inf slab terms
        d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3.from_array(jnp.asarray(o_np))
    d = Vec3.from_array(jnp.asarray(d_np))
    alive = jnp.asarray(alive)
    t_init = jnp.asarray(t_init)
    kw = dict(block_r=128, interpret=True, with_attrs=with_attrs)
    dense = intersect_triangles_bvh(o, d, alive, t_init, cl.aabb,
                                    cl.table_t, **kw)
    comp = intersect_triangles_bvh_compact(o, d, alive, t_init, cl.aabb,
                                           cl.table_t, cap=cap,
                                           sort_key=sort_key, **kw)
    # parity is modulo the alive mask: the dense kernel lets dead rays
    # report coincidental hits (they ride along in MT lanes of blocks
    # their live neighbors open), the compact path reports misses; both
    # are masked out downstream (trace_rays: h_alive = alive & hit.hit)
    live = np.asarray(alive) > 0
    np.testing.assert_array_equal(np.asarray(dense[0])[live],
                                  np.asarray(comp[0])[live])
    np.testing.assert_array_equal(np.asarray(dense[1])[live],
                                  np.asarray(comp[1])[live])
    assert np.isinf(np.asarray(comp[0])[~live]).all()
    assert (np.asarray(comp[1])[~live] == -1).all()
    if with_attrs:
        wins = (np.asarray(dense[1]) >= 0) & live
        np.testing.assert_array_equal(np.asarray(dense[2])[:, wins],
                                      np.asarray(comp[2])[:, wins])
        # losers carry the documented miss fill (zeros) on the compact
        # path; the dense kernel also leaves them at scratch zero
        assert not np.isnan(np.asarray(comp[2])).any()


def test_compact_sort_key_policy(monkeypatch):
    """Auto sort-key is "super" in every regime (measured better on both
    the VMEM-resident and HBM-streamed benches — see _resolve_sort_key);
    explicit arg and env keep "morton" available for sweeps; "super"
    fallback when bucket bits run out."""
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        _resolve_sort_key)
    monkeypatch.delenv("SRT_BVH_COMPACT_KEY", raising=False)
    args = dict(aabb=None, table_t=None, table_tr=None, hbm_table=None,
                packed_vmem=None)
    assert _resolve_sort_key(None, bucket_bits=10, **args) == "super"
    assert _resolve_sort_key("morton", bucket_bits=10, **args) == "morton"
    monkeypatch.setenv("SRT_BVH_COMPACT_KEY", "morton")
    assert _resolve_sort_key("super", bucket_bits=10, **args) == "morton"
    monkeypatch.setenv("SRT_BVH_COMPACT_KEY", "auto")
    assert _resolve_sort_key("morton", bucket_bits=10, **args) == "super"
    monkeypatch.setenv("SRT_BVH_COMPACT_KEY", "bogus")
    with pytest.raises(ValueError):
        _resolve_sort_key(None, bucket_bits=10, **args)
    # too few bucket bits: a 3-bit Morton cell cannot beat the supers
    monkeypatch.delenv("SRT_BVH_COMPACT_KEY", raising=False)
    assert _resolve_sort_key("morton", bucket_bits=5, **args) == "super"


def test_table_streams_hbm_policy():
    """The bounce-0 compaction flip (trace_rays) keys on the SAME
    residency resolution intersect_triangles_bvh uses: stream iff the
    row table exceeds VMEM residence AND the packed form exceeds the
    packed-VMEM budget."""
    import types
    import jax.numpy as jnp
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        table_streams_hbm, _TROWS, VMEM_TABLE_MAX_SLOTS,
        PACKED_VMEM_MAX_CLUSTERS)
    mk = lambda slots, tr_clusters: types.SimpleNamespace(
        table_t=jnp.zeros((slots, 128), jnp.float32),
        table_tr=(None if tr_clusters is None else
                  jnp.zeros((tr_clusters, _TROWS, 128), jnp.float32)))
    assert not table_streams_hbm(None)
    assert not table_streams_hbm(mk(VMEM_TABLE_MAX_SLOTS, None))
    assert table_streams_hbm(mk(VMEM_TABLE_MAX_SLOTS * 4, None))
    assert not table_streams_hbm(
        mk(VMEM_TABLE_MAX_SLOTS * 4, PACKED_VMEM_MAX_CLUSTERS))
    assert table_streams_hbm(
        mk(VMEM_TABLE_MAX_SLOTS * 4, PACKED_VMEM_MAX_CLUSTERS + 1))


def test_dma_slots_policy(monkeypatch):
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        _resolve_dma_slots)
    monkeypatch.delenv("SRT_BVH_DMA_SLOTS", raising=False)
    assert _resolve_dma_slots() == 8
    monkeypatch.setenv("SRT_BVH_DMA_SLOTS", "4")
    assert _resolve_dma_slots() == 4
    monkeypatch.setenv("SRT_BVH_DMA_SLOTS", "1")
    with pytest.raises(ValueError):
        _resolve_dma_slots()


def test_compact_cap_auto_policy():
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import compact_cap_auto
    assert compact_cap_auto(1536 * 8) is None          # too small to pay
    assert compact_cap_auto(1920 * 1080) == 68 * 1536  # 1/20, block-rounded
    assert compact_cap_auto(1536 * 64) == 16 * 1536    # floor: 16 blocks
    assert compact_cap_auto(1536 * 64) * 20 >= 1536 * 64


@pytest.mark.parametrize("scenario", ["compacted", "overflow"])
def test_compact_shaded_matches_dense_shading(scenario):
    """shaded=True returns exactly what closest_hit's attrs branch would
    compute at full R (barycentric smooth normal, normalized, and the
    material row) for every winning ray, and (inf, 0, 0) for the rest.
    Covers both cond branches via the cap."""
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
        intersect_triangles_bvh_compact)
    from simple_raytracer_tpu.ops.intersect import (
        barycentric_weights_from_edges)
    from simple_raytracer_tpu.ops.vec import normalize
    ds = _mesh_scene()
    cl = ds.triangles.clusters
    n = 1024
    rng = np.random.default_rng(23)
    o_np = rng.uniform(2.5, 3.5, (n, 3)).astype(np.float32)
    to_mesh = -o_np + rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    away = o_np + rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    if scenario == "overflow":
        d_np, cap = to_mesh, 128
    else:
        aimed = rng.random(n) < 0.125
        d_np = np.where(aimed[:, None], to_mesh, away)
        cap = 512
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3.from_array(jnp.asarray(o_np))
    d = Vec3.from_array(jnp.asarray(d_np))
    alive = jnp.ones((n,), jnp.float32)
    t_init = jnp.full((n,), jnp.inf, jnp.float32)
    kw = dict(block_r=128, interpret=True)
    t_d, i_d, attrs = intersect_triangles_bvh(o, d, alive, t_init,
                                              cl.aabb, cl.table_t,
                                              with_attrs=True, **kw)
    t_c, n_c, mat_c = intersect_triangles_bvh_compact(
        o, d, alive, t_init, cl.aabb, cl.table_t, cap=cap, shaded=True,
        **kw)
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_c))
    # closest_hit's own shading tail at full R (the reference math)
    pos = o + d * t_d
    tv0 = Vec3(attrs[0], attrs[1], attrs[2])
    ea = Vec3(attrs[3], attrs[4], attrs[5])
    eb = Vec3(attrs[6], attrs[7], attrs[8])
    wx, wy, wz = barycentric_weights_from_edges(ea, eb, pos - tv0)
    n_ref = normalize(Vec3(attrs[9], attrs[10], attrs[11]) * wx
                      + Vec3(attrs[12], attrs[13], attrs[14]) * wy
                      + Vec3(attrs[15], attrs[16], attrs[17]) * wz)
    wins = np.asarray(i_d) >= 0
    # CPU interpret mode contracts FMAs differently between the two
    # compilation contexts (1-ulp differences — the file-wide convention,
    # see test_bvh_matches_dense); compiled on TPU both are bit-exact
    for got, ref in ((n_c.x, n_ref.x), (n_c.y, n_ref.y), (n_c.z, n_ref.z)):
        np.testing.assert_allclose(np.asarray(got)[wins],
                                   np.asarray(ref)[wins],
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_array_equal(np.asarray(got)[~wins], 0.0)
    np.testing.assert_array_equal(np.asarray(mat_c)[wins],
                                  np.asarray(attrs[18])[wins])
    np.testing.assert_array_equal(np.asarray(mat_c)[~wins], 0.0)


@pytest.mark.parametrize("n_c", [2500, 5000])
def test_admission_boxes_conservative_and_bounded(n_c):
    """_admission_boxes (the compact wrapper's slab-test set) caps at
    256 boxes no matter the cluster count, and every REAL cluster box is
    fully contained in its ancestor admission box (conservative: no ray
    that could reach a triangle is ever rejected).  5,000 clusters
    (ceil(5000/16) = 313 supers > 256) exercises the config-7-scale
    coarsening loop; 2,500 stays single-level."""
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import (_SUPER,
                                                            _admission_boxes)
    rng = np.random.default_rng(5)
    lo = rng.uniform(-50, 50, (n_c, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 4.0, (n_c, 3)).astype(np.float32)
    aabb = np.zeros((n_c, 8), np.float32)
    aabb[:, 0:3] = lo
    aabb[:, 3:6] = hi
    # sprinkle scene-build bucket sentinels (lo = 3e38 rows)
    aabb[::97] = np.array([3.0e38] * 6 + [0.0, 0.0], np.float32)
    boxes = np.asarray(_admission_boxes(jnp.asarray(aabb)))
    assert boxes.shape[0] <= 256
    # ancestry is positional: cluster i -> box i // divisor, where each
    # union round folds _SUPER children (padding appends at the end, so
    # indices divide cleanly across rounds)
    divisor = _SUPER
    while -(-n_c // divisor) > 256:
        divisor *= _SUPER
    real = aabb[:, 0] < 1.0e37
    anc = np.arange(n_c)[real] // divisor
    assert np.all(boxes[anc, 0:3] <= aabb[real, 0:3] + 1e-6)
    assert np.all(boxes[anc, 3:6] >= aabb[real, 3:6] - 1e-6)


def test_hbm_streaming_megamesh_parity():
    """>= 1M-triangle parity fuzz (VERDICT r3 item 4): the HBM/DMA
    streaming kernel on a 1.31M-triangle sculpt agrees bit-exactly with
    the dense XLA Moller-Trumbore on the candidate set.  Brute force
    over all 1.3M triangles costs ~500 s on CPU, so the reference is
    restricted to triangles of clusters whose boxes the ray's slab
    interval touches (computed in float64 with inflated boxes — strictly
    conservative over any f32 hit the kernel can commit, since a
    committed hit point lies inside its cluster's exact box)."""
    from simple_raytracer_tpu.models.meshgen import organic_blob
    from simple_raytracer_tpu.models.shapes import transform_trs

    pos, nrm = organic_blob(subdivisions=8)        # 1,310,720 tris
    sc = Scene()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span, transform=transform_trs((0, 0, -2.5)))
    ds = sc.build()
    cl = ds.triangles.clusters
    assert cl.table_t.shape[0] >= 1_000_000

    rng = np.random.default_rng(17)
    n = 128
    o_np = rng.uniform(1.5, 3.0, (n, 3)).astype(np.float32)
    d_np = (np.array([0, 0, -2.5]) - o_np
            + rng.normal(scale=0.6, size=(n, 3))).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3.from_array(jnp.asarray(o_np))
    d = Vec3.from_array(jnp.asarray(d_np))
    alive = jnp.ones((n,), jnp.float32)
    t_init = jnp.full((n,), jnp.inf, jnp.float32)

    t_k, i_k, attrs = intersect_triangles_bvh(
        o, d, alive, t_init, cl.aabb, cl.table_t, block_r=128,
        interpret=True, hbm_table=True, table_tr=cl.table_tr,
        with_attrs=True)

    # conservative candidate clusters: float64 slab vs inflated boxes
    aabb = np.asarray(cl.aabb, np.float64)
    real = aabb[:, 0] < 1.0e37
    lo = aabb[:, 0:3] - 1e-4
    hi = aabb[:, 3:6] + 1e-4
    o64 = o_np.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d_np.astype(np.float64)
    t1 = (lo[None] - o64[:, None]) * inv[:, None]
    t2 = (hi[None] - o64[:, None]) * inv[:, None]
    t1, t2 = np.fmin(t1, t2), np.fmax(t1, t2)   # fmin/fmax ignore NaNs
    near = np.nanmax(np.where(np.isnan(t1), -np.inf, t1), axis=2)
    far = np.nanmin(np.where(np.isnan(t2), np.inf, t2), axis=2)
    admit = (np.maximum(near, 0.0) <= far) & real[None, :]
    cand_clusters = np.where(admit.any(axis=0))[0]
    k = cl.table_t.shape[0] // cl.aabb.shape[0]
    slots = (cand_clusters[:, None] * k + np.arange(k)[None, :]).ravel()
    tt = np.asarray(cl.table_t)
    valid = tt[slots, 19] > 0
    slots = slots[valid]
    gidx = tt[slots, 20].astype(np.int64)
    order = np.argsort(gidx, kind="stable")     # lowest-gidx tie-break
    slots, gidx = slots[order], gidx[order]

    import jax
    sub = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[gidx]),
                       ds.triangles._replace(clusters=None))
    t_ref, i_sub = intersect_triangles(o, d, sub, chunk=8192)
    t_ref, i_sub = np.asarray(t_ref), np.asarray(i_sub)
    i_ref = np.where(np.isfinite(t_ref), gidx[np.maximum(i_sub, 0)], -1)

    wins = np.isfinite(t_ref)
    assert wins.sum() >= 32          # the fuzz actually hits the mesh
    t_k = np.asarray(t_k)
    np.testing.assert_array_equal(wins, np.isfinite(t_k))
    # CPU interpret mode contracts FMAs differently between the two
    # compilation contexts (1-ulp differences — the file-wide
    # convention, see test_bvh_matches_dense); compiled on TPU both
    # are bit-exact (scripts-level probe, round 4)
    np.testing.assert_allclose(t_k[wins], t_ref[wins], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_k)[wins], i_ref[wins])
    assert (np.asarray(i_k)[~wins] == -1).all()
