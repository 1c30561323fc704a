"""Fused Pallas bounce kernels vs the XLA scan path.

The whole-trace megakernel (ops/pallas/bounce_kernel.py) and the
per-bounce kernel reuse the SAME rng/bsdf/vec source as ops/trace.py, so
on TPU they agree to float-associativity noise (measured <= 5e-5 at
1080p) and on CPU interpret mode to XLA-fusion FMA differences.  A draw
that lands within ~1e-6 of a Bernoulli threshold can flip a path's
branch entirely, so comparisons bound the RMSE and the fraction of
agreeing pixels rather than the max error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.trace import make_render_step
from simple_raytracer_tpu.ops import rng


def _canvases(n, w, h, fused_backend):
    scene, camera, options = CONFIGS[n](width=w, height=h)
    ds = scene.build()
    cam = camera.state(w / h)
    out = []
    for backend in ("jnp", fused_backend):
        f = make_render_step(w, h, 2, 4, tri_backend=backend,
                             ray_tile=None, jit=False)
        c = jnp.zeros((h, w, 3), jnp.float32)
        out.append(np.asarray(f(ds, cam, c, jnp.uint32(1000))))
    return out


def _assert_close(a, b):
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    agree = float(np.mean(np.all(np.abs(a - b) < 1e-3, axis=-1)))
    assert rmse < 5e-3, f"rmse {rmse}"
    assert agree > 0.99, f"only {agree:.3f} of pixels agree"


@pytest.mark.parametrize("n", [1, 2, 3])
def test_megakernel_matches_scan_path(n):
    """configs 1-3 (sphere/plane/small-mesh) go through the whole-trace
    megakernel when tri_backend='fused' (interpret mode on CPU)."""
    a, b = _canvases(n, 96, 54, "fused")
    _assert_close(a, b)


def test_megakernel_clustered_mesh_matches_scan_path():
    """Clustered mesh scenes traverse the BVH table inside the
    megakernel (in-kernel group slab words + gated Moller-Trumbore)."""
    a, b = _canvases(5, 64, 36, "fused")
    _assert_close(a, b)


def test_megakernel_mt_slice_gating_bit_identical(monkeypatch):
    """mt_slices > 1 re-slabs clusters per static 128-lane ray slice and
    skips slices with no interval under the live t — the canvas must be
    BIT-IDENTICAL to the ungated form (per-column math, and skipped
    slices provably hold no closer hit)."""
    import simple_raytracer_tpu.ops.pallas.bounce_kernel as bok

    def canvas():
        scene, camera, options = CONFIGS[5](width=64, height=36)
        ds = scene.build()
        f = make_render_step(64, 36, 1, 3, tri_backend="fused",
                             ray_tile=None, jit=False)
        c = jnp.zeros((36, 64, 3), jnp.float32)
        return np.asarray(f(ds, camera.state(64 / 36), c, jnp.uint32(41)))

    a = canvas()
    monkeypatch.setattr(bok, "MEGA_MT_SLICES", 4)
    b = canvas()
    np.testing.assert_array_equal(a, b)

    # an mt_slices value that cannot 128-lane-align its slices must fail
    # LOUDLY at kernel construction, not deep inside the pallas trace
    monkeypatch.setattr(bok, "MEGA_MT_SLICES", 5)
    with pytest.raises(ValueError, match="SRT_MEGA_MT_SLICES"):
        canvas()


def test_megakernel_packed_table_bit_identical(monkeypatch):
    """Big-mesh megakernel form: when the row table outgrows VMEM
    residence, the kernel traverses the PACKED transposed table (one
    (24, 128) tile per cluster + an exact MXU transpose per visit).
    Shrinking the residence threshold forces config 4's mesh onto that
    path; the canvas must be BIT-IDENTICAL to the row-table form (same
    arithmetic, same traversal — only the tile source differs)."""
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk

    def canvas():
        scene, camera, options = CONFIGS[4](width=48, height=32)
        ds = scene.build()
        assert ds.triangles.clusters is not None
        f = make_render_step(48, 32, 1, 3, tri_backend="fused",
                             ray_tile=None, jit=False)
        c = jnp.zeros((32, 48, 3), jnp.float32)
        return ds, np.asarray(f(ds, camera.state(1.5), c, jnp.uint32(77)))

    ds_row, a = canvas()
    assert ds_row.triangles.clusters.table_t.shape[0] <= \
        bk.VMEM_TABLE_MAX_SLOTS          # row form taken
    monkeypatch.setattr(bk, "VMEM_TABLE_MAX_SLOTS", 256)
    ds_pk, b = canvas()
    # auto cluster_size switched to 128 and the packed gate engaged
    assert ds_pk.triangles.clusters.table_t.shape[0] > 256
    np.testing.assert_array_equal(a, b)


def test_enclosed_flag_is_result_neutral():
    """SceneFlags.sky_reachable only toggles the megakernel's early-exit
    liveness check: the fori_loop (enclosed) and while_loop forms must be
    bit-identical on the same scene (config 1 presets enclosed=True)."""
    scene, camera, _ = CONFIGS[1](width=64, height=64)
    assert scene.sky_reachable is False
    cam = camera.state(1.0)
    outs = []
    for reachable in (False, True):
        scene.sky_reachable = reachable
        ds = scene.build()
        assert ds.flags.sky_reachable is reachable
        f = make_render_step(64, 64, 1, 4, tri_backend="fused",
                             ray_tile=None, jit=False)
        c = jnp.zeros((64, 64, 3), jnp.float32)
        outs.append(np.asarray(f(ds, cam, c, jnp.uint32(31))))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_scene_flags_static_in_pytree():
    """SceneFlags is aux-only: toggling it changes the jit cache key
    (recompile) but contributes no traced leaves."""
    from simple_raytracer_tpu.ops.scene_types import SceneFlags

    leaves, treedef = jax.tree_util.tree_flatten(SceneFlags(False))
    assert leaves == []
    t2 = jax.tree_util.tree_structure(SceneFlags(True))
    assert treedef != t2
    assert jax.tree_util.tree_structure(SceneFlags(False)) == treedef


def test_megakernel_tiled_order_identical():
    """ray_tile is a pure permutation for the megakernel's in-kernel
    raygen too: tiled and untiled fused renders are bit-identical."""
    scene, camera, _ = CONFIGS[2](width=128, height=64)
    ds = scene.build()
    cam = camera.state(2.0)
    outs = []
    for tile in (None, (8, 64)):
        f = make_render_step(128, 64, 1, 3, tri_backend="fused",
                             ray_tile=tile, jit=False)
        c = jnp.zeros((64, 128, 3), jnp.float32)
        outs.append(np.asarray(f(ds, cam, c, jnp.uint32(77))))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_per_bounce_kernel_matches_scan_path():
    """Mesh scenes interleave the BVH kernel with the per-bounce shade
    kernel (trace_rays_fused)."""
    from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
    from simple_raytracer_tpu.ops.trace import trace_rays, trace_rays_fused

    scene, camera, _ = CONFIGS[5]()
    ds = scene.build()
    assert ds.triangles.clusters is not None
    cam = camera.state(16 / 9)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(96, 54, 1, jnp.uint32(5), cam.position, rot,
                               cam.aspect_ratio, cam.fov_scale)
    ref = trace_rays(ds, o, d, seed, 3, tri_backend="jnp")
    got = trace_rays_fused(ds, o, d, seed, 3, block_r=512, interpret=True)
    a = np.stack([np.asarray(c) for c in ref], -1)
    b = np.stack([np.asarray(c) for c in got], -1)
    _assert_close(a, b)


def test_cos_2pi_accuracy():
    """cos_2pi matches cos(2*pi*u) to ~1 f32 ulp over [0, 1) and at the
    quadrant boundaries (the folding is Sterbenz-exact)."""
    u = np.concatenate([np.random.RandomState(0).rand(100000),
                        [0.0, 0.25, 0.5, 0.75, 1.0]]).astype(np.float32)
    got = np.asarray(jax.jit(rng.cos_2pi)(jnp.asarray(u)), np.float64)
    ref = np.cos(2.0 * np.pi * u.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 1.5e-7


def test_uniform_unchanged_by_cast_emulation():
    """rng.next_uniform's hi/lo u32->f32 emulation is bit-identical to
    the direct convert for every output magnitude."""
    s = jnp.asarray(np.arange(65536, dtype=np.uint32) * np.uint32(2654435761))
    _, u = jax.jit(rng.next_uniform)(s)
    s2 = s * np.uint32(747796405) + np.uint32(2891336453)
    shift = (s2 >> np.uint32(28)) + np.uint32(4)
    r = ((s2 >> shift) ^ s2) * np.uint32(277803737)
    r = (r >> np.uint32(22)) ^ r
    direct = np.asarray(r).astype(np.float32) * np.float32(2.0 ** -32)
    np.testing.assert_array_equal(np.asarray(u), direct)


def test_megakernel_band_chunking_bit_identical(monkeypatch):
    """Renders whose grid exceeds the per-call SMEM block budget split
    into row bands (trace_full_fused) / column chunks (bounce_step);
    band raygen re-derives the same global pixel seeds from row0 — the
    same per-pixel math either way.  On TPU the per-band kernel program
    is the identical code with different SMEM scalars (bit-identical);
    interpret mode compiles each band SHAPE as its own XLA program with
    its own FMA fusion, so the CPU comparison allows ~1-ulp noise (the
    tolerance every cross-program test here uses)."""
    import simple_raytracer_tpu.ops.pallas.bounce_kernel as bok

    def canvas():
        scene, camera, options = CONFIGS[2](width=64, height=48)
        ds = scene.build()
        f = make_render_step(64, 48, 1, 3, tri_backend="fused",
                             ray_tile=(8, 64), jit=False)
        c = jnp.zeros((48, 64, 3), jnp.float32)
        return np.asarray(f(ds, camera.state(64 / 48), c, jnp.uint32(17)))

    a = canvas()                                   # 64*48/1536 = 2 blocks
    monkeypatch.setattr(bok, "MEGA_MAX_BLOCKS", 1)  # force 1 block/call
    b = canvas()
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)

    # the clustered-mesh scene exercises bounce_step's column chunking
    # through the split path as well
    def mesh_canvas():
        scene, camera, options = CONFIGS[5](width=64, height=36)
        ds = scene.build()
        f = make_render_step(64, 36, 1, 2, tri_backend="fused",
                             ray_tile=None, jit=False)
        c = jnp.zeros((36, 64, 3), jnp.float32)
        return np.asarray(f(ds, camera.state(64 / 36), c, jnp.uint32(23)))

    monkeypatch.setattr(bok, "MEGA_MAX_BLOCKS", 1600)
    ma = mesh_canvas()
    monkeypatch.setattr(bok, "MEGA_MAX_BLOCKS", 1)
    mb = mesh_canvas()
    np.testing.assert_allclose(ma, mb, rtol=2e-6, atol=2e-7)
