"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY §4: the shard_map tile-split render must match the
single-chip render of the same scene to ~1 ulp (pixel seeds depend only on global
pixel id, render.cl:496)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_raytracer_tpu import Camera, Renderer, RenderOptions, Scene
from simple_raytracer_tpu.models.presets import config2_four_spheres
from simple_raytracer_tpu.parallel.mesh import make_mesh
from simple_raytracer_tpu.parallel.shard import (make_sharded_canvas,
                                                 make_sharded_render_step)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def test_sharded_bit_parity_with_single_chip(devices):
    scene, camera, _ = config2_four_spheres(width=64, height=48)
    opts = RenderOptions(width=64, height=48, num_samples=2, num_bounces=4)
    # single chip
    r = Renderer(opts, scene=scene)
    r.step(camera, time=42)
    single = np.asarray(r.canvas)

    # 8-way sharded
    mesh = make_mesh(devices)
    step, mesh, _ = make_sharded_render_step(64, 48, 2, 4, mesh=mesh)
    canvas = make_sharded_canvas(mesh, 48, 64)
    cam_state = camera.state(64 / 48)
    canvas = step(r.device_scene, cam_state, canvas, jnp.uint32(42))
    sharded = np.asarray(canvas)

    # identical math and RNG streams; tolerance only for compiler fp
    # reassociation (fma/fusion) differences between the two programs
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_progressive_accumulation(devices):
    scene, camera, _ = config2_four_spheres(width=32, height=32)
    mesh = make_mesh(devices)
    step, mesh, _ = make_sharded_render_step(32, 32, 1, 2, mesh=mesh)
    canvas = make_sharded_canvas(mesh, 32, 32)
    cam = camera.state(1.0)
    ds = scene.build()
    c1 = step(ds, cam, canvas, jnp.uint32(7))
    snapshot = np.asarray(c1)
    c2 = step(ds, cam, c1, jnp.uint32(7))  # same time -> exact doubling
    np.testing.assert_allclose(np.asarray(c2), 2 * snapshot, rtol=1e-6)


def test_mesh_height_divisibility():
    mesh = make_mesh(jax.devices())
    with pytest.raises(ValueError):
        make_sharded_render_step(64, 50, 1, 2, mesh=mesh)


def test_renderer_all_devices_bit_parity(devices):
    """The PRODUCT path: Renderer(all_devices=True) spreads the step over
    the mesh and matches the single-device renderer."""
    scene, camera, _ = config2_four_spheres(width=64, height=48)
    opts1 = RenderOptions(width=64, height=48, num_samples=2, num_bounces=4)
    r1 = Renderer(opts1, scene=scene)
    r1.step(camera, time=5)
    r1.step(camera, time=6)

    opts8 = RenderOptions(width=64, height=48, num_samples=2, num_bounces=4,
                          all_devices=True)
    r8 = Renderer(opts8, scene=scene)
    assert r8.num_devices == len(devices)
    r8.step(camera, time=5)
    r8.step(camera, time=6)
    np.testing.assert_allclose(np.asarray(r8.canvas), np.asarray(r1.canvas),
                               rtol=1e-6, atol=1e-7)
    # tonemapped output path works on the sharded canvas
    np.testing.assert_array_equal(r8.image(), r1.image())
    # checkpoint round trip keeps the sharding working
    state = r8.state_dict()
    r8.clear_canvas()
    r8.load_state_dict(state)
    r8.step(camera, time=7)


def test_renderer_all_devices_height_check(devices):
    with pytest.raises(ValueError, match="height"):
        Renderer(RenderOptions(width=64, height=50, all_devices=True))


def test_sharded_aov_matches_single_chip(devices):
    """AOV modes thread through the sharded step (the same mode selector
    make_sharded_render_step receives): sharded depth == single-device
    depth, bit for bit."""
    scene, camera, _ = config2_four_spheres(width=64, height=48)
    r1 = Renderer(RenderOptions(width=64, height=48, num_samples=2,
                                num_bounces=4, aov="depth"), scene=scene)
    r1.step(camera, time=3)
    r8 = Renderer(RenderOptions(width=64, height=48, num_samples=2,
                                num_bounces=4, aov="depth",
                                all_devices=True), scene=scene)
    assert r8.num_devices == len(devices)
    r8.step(camera, time=3)
    np.testing.assert_array_equal(np.asarray(r8.canvas),
                                  np.asarray(r1.canvas))
    # sky rows are exactly 0 in the depth AOV, across shard boundaries
    assert float(np.asarray(r8.canvas)[0].max()) == 0.0


def test_sharded_bvh_backend_matches_single_chip(devices):
    """The packet-culling kernel path composes with shard_map: force the
    bvh backend (interpret mode on CPU) inside the sharded step and
    compare against the plain jnp single-chip render."""
    from simple_raytracer_tpu.models.presets import config4_mesh_glass
    import simple_raytracer_tpu.ops.pallas.bvh_kernel as bk

    scene, camera, _ = config4_mesh_glass(width=64, height=32)
    ds = scene.build()
    assert ds.triangles.clusters is not None
    assert ds.triangles.clusters.table_t is not None

    opts = RenderOptions(width=64, height=32, num_samples=1, num_bounces=2,
                         tri_backend="jnp", ray_tile=None)
    r = Renderer(opts, scene=scene)
    r.step(camera, time=13)
    single = np.asarray(r.canvas)

    orig = bk.intersect_triangles_bvh

    def interp(o, d, alive, t_init, aabb, table_t, block_r=1536,
               interpret=False, with_attrs=False, hbm_table=None, **kw):
        return orig(o, d, alive, t_init, aabb, table_t, block_r=128,
                    interpret=True, with_attrs=with_attrs,
                    hbm_table=hbm_table, **kw)

    bk.intersect_triangles_bvh = interp
    try:
        mesh = make_mesh(devices)
        step, mesh, _ = make_sharded_render_step(
            64, 32, 1, 2, mesh=mesh, tri_backend="bvh", ray_tile=None)
        canvas = make_sharded_canvas(mesh, 32, 64)
        out = step(ds, camera.state(2.0), canvas, jnp.uint32(13))
        np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5,
                                   atol=1e-6)
    finally:
        bk.intersect_triangles_bvh = orig


def test_sharded_ray_tile_plumbs(devices):
    """ray_tile inside shard_map is a pure permutation: identical output."""
    scene, camera, _ = config2_four_spheres(width=64, height=32)
    ds = scene.build()
    mesh = make_mesh(devices)
    step_a, _, _ = make_sharded_render_step(64, 32, 1, 2, mesh=mesh)
    step_b, _, _ = make_sharded_render_step(64, 32, 1, 2, mesh=mesh,
                                            ray_tile=(4, 32))
    cam = camera.state(2.0)
    ca = step_a(ds, cam, make_sharded_canvas(mesh, 32, 64), jnp.uint32(3))
    cb = step_b(ds, cam, make_sharded_canvas(mesh, 32, 64), jnp.uint32(3))
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                               rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError, match="ray tile"):
        make_sharded_render_step(64, 32, 1, 2, mesh=mesh, ray_tile=(3, 32))


def test_sharded_mesh_scene_matches_single_chip(devices):
    """Mesh scene (triangle SoA + clusters pytree) under shard_map."""
    from simple_raytracer_tpu.models.presets import config4_mesh_glass

    scene, camera, _ = config4_mesh_glass(width=64, height=32)
    ds = scene.build()
    assert ds.triangles.clusters is not None  # clusters ride the pytree

    opts = RenderOptions(width=64, height=32, num_samples=1, num_bounces=3,
                         tri_backend="jnp", ray_tile=None)
    r = Renderer(opts, scene=scene)
    r.step(camera, time=21)
    single = np.asarray(r.canvas)

    mesh = make_mesh(devices)
    step, mesh, _ = make_sharded_render_step(64, 32, 1, 3, mesh=mesh)
    canvas = make_sharded_canvas(mesh, 32, 64)
    out = step(ds, camera.state(2.0), canvas, jnp.uint32(21))
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5, atol=1e-6)


def test_distributed_helpers_single_process():
    """Multi-host helpers degrade to no-ops in a single process."""
    import numpy as np

    from simple_raytracer_tpu.parallel import distributed

    assert not distributed.is_multiprocess()
    assert distributed.should_write_output()
    c = jnp.ones((4, 8, 3), jnp.float32)
    np.testing.assert_array_equal(distributed.fetch_canvas(c),
                                  np.ones((4, 8, 3), np.float32))


def test_distributed_initialize_subprocess():
    """jax.distributed comes up for a 1-process 'cluster' (the DCN path's
    smallest instance; real multi-host needs multiple machines)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sysconfig
    # -S skips site/startup plugins (one here initializes the XLA backend
    # at interpreter start, which would forbid jax.distributed.initialize)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=sysconfig.get_paths()["purelib"] + os.pathsep + repo)
    code = (
        "from simple_raytracer_tpu.parallel import distributed\n"
        "import jax\n"
        "distributed.initialize(coordinator_address='localhost:19181',\n"
        "                       num_processes=1, process_id=0)\n"
        "distributed.initialize()   # idempotent\n"
        "print('count', jax.process_count(), distributed.is_multiprocess())\n"
    )
    out = subprocess.run([sys.executable, "-S", "-c", code], env=env,
                         capture_output=True, text=True, timeout=240,
                         cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "count 1 False" in out.stdout


_DCN_WORKER = """
import sys
proc_id = int(sys.argv[1])
out_dir = sys.argv[2]
port = int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
from simple_raytracer_tpu.parallel import distributed
distributed.initialize(coordinator_address="localhost:%d" % port,
                       num_processes=2, process_id=proc_id)
assert jax.process_count() == 2 and distributed.is_multiprocess()
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8
import numpy as np
from simple_raytracer_tpu import Camera, Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config2_four_spheres
scene, camera, _ = config2_four_spheres(width=64, height=48)
opts = RenderOptions(width=64, height=48, num_samples=1, num_bounces=3,
                     all_devices=True)
r = Renderer(opts, scene=scene)
assert r.num_devices == 8
r.step(camera, time=5)
# state_dict -> fetch_canvas -> process_allgather: a COLLECTIVE that every
# process must run (ADVICE r2: gating it on process 0 deadlocks)
st = r.state_dict()
if distributed.should_write_output():
    np.savez(out_dir + "/dcn_canvas.npz", canvas=st["canvas"])
else:
    # the non-writing process proves it got the SAME full image over DCN
    np.savez(out_dir + "/dcn_canvas_p1.npz", canvas=st["canvas"])
"""


def test_distributed_two_process_render(tmp_path):
    """A REAL 2-process jax.distributed cluster (gloo over localhost):
    each process owns 4 virtual CPU devices, the Renderer's all_devices
    step runs over the process-spanning 8-device mesh, and
    fetch_canvas's process_allgather branch assembles the full image on
    BOTH processes — compared here against the in-process single-chip
    render of the same scene (SURVEY §5 distributed backend)."""
    import os
    import subprocess
    import sys
    import sysconfig

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "dcn_worker.py"
    worker.write_text(_DCN_WORKER)
    # -S skips the startup plugin that would initialize XLA before
    # jax.distributed.initialize; PYTHONPATH restores the import path
    env = dict(os.environ,
               PYTHONPATH=sysconfig.get_paths()["purelib"] + os.pathsep + repo)
    env.pop("JAX_PLATFORMS", None)
    # A fixed coordinator port collides across concurrent runs (xdist,
    # parallel CI jobs): let the OS pick a free one.  The tiny race
    # between close() and the coordinator's bind is acceptable for a test.
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "-S", str(worker), str(i), str(tmp_path), str(port)],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (so[-1000:], se[-2000:])

    gathered = np.load(tmp_path / "dcn_canvas.npz")["canvas"]
    gathered_p1 = np.load(tmp_path / "dcn_canvas_p1.npz")["canvas"]
    np.testing.assert_array_equal(gathered, gathered_p1)

    from simple_raytracer_tpu.models.presets import config2_four_spheres
    scene, camera, _ = config2_four_spheres(width=64, height=48)
    r = Renderer(RenderOptions(width=64, height=48, num_samples=1,
                               num_bounces=3), scene=scene)
    r.step(camera, time=5)
    np.testing.assert_allclose(gathered, np.asarray(r.canvas),
                               rtol=1e-6, atol=1e-7)


def test_sharded_fused_megakernel_matches_single(devices):
    """The fused whole-trace megakernel under shard_map (per-device
    traced row0 feeds in-kernel raygen) matches the single-chip fused
    render.  Interpret-mode Pallas on the CPU mesh."""
    scene, camera, _ = config2_four_spheres(width=64, height=48)
    ds = scene.build()
    cam = camera.state(64 / 48)

    from simple_raytracer_tpu.ops.trace import make_render_step
    single_fn = make_render_step(64, 48, 1, 3, tri_backend="fused",
                                 ray_tile=None, jit=False)
    single = np.asarray(single_fn(ds, cam,
                                  jnp.zeros((48, 64, 3), jnp.float32),
                                  jnp.uint32(21)))

    mesh = make_mesh(devices)
    step, mesh, _ = make_sharded_render_step(64, 48, 1, 3, mesh=mesh,
                                             tri_backend="fused",
                                             ray_tile=None)
    canvas = make_sharded_canvas(mesh, 48, 64)
    out = step(ds, cam, canvas, jnp.uint32(21))
    # interpret-mode Pallas and XLA fuse FMAs differently per program;
    # measured band diffs are ~1.6e-6 (pure fp reassociation noise)
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-4,
                               atol=1e-5)


def test_renderer_all_devices_tiled_canvas(devices):
    """Per-band tile-order accumulation under shard_map composes into
    the global untile at image time (band boundaries align with row
    tiles): 64x64 over 8 devices tiles each 8-row band."""
    scene, camera, _ = config2_four_spheres(width=64, height=64)
    opts1 = RenderOptions(width=64, height=64, num_samples=1, num_bounces=3)
    r1 = Renderer(opts1, scene=scene)
    r1.step(camera, time=9)
    single = r1.image()

    r8 = Renderer(RenderOptions(width=64, height=64, num_samples=1,
                                num_bounces=3, all_devices=True),
                  scene=scene)
    assert r8._tile == (8, 64)
    r8.step(camera, time=9)
    np.testing.assert_array_equal(r8.image(), single)


def test_viewer_set_render_keeps_all_devices(devices):
    """Changing render params in a SHARDED viewer must not downgrade it
    to one device: _set_render rebuilds RenderOptions with
    dataclasses.replace, so all_devices (and every other non-panel
    field) carries into the background-compiled replacement renderer."""
    import time as _time
    from simple_raytracer_tpu.viewer import RenderLoop

    sc = Scene()
    sc.add_sphere((0, 0, -3), 1.0)
    opts = RenderOptions(width=64, height=48, num_samples=1, num_bounces=2,
                         all_devices=True)
    r = Renderer(opts, scene=sc)
    assert r.num_devices == 8
    loop = RenderLoop(r, Camera(), scene=sc)
    res = loop.handle_edit({"op": "set_render", "bounces": 3})
    assert res["ok"] and res["compiling"]
    with loop._lock:
        pend = loop._pending_opts
    assert pend is not None and pend.all_devices is True
    deadline = _time.time() + 240
    while _time.time() < deadline:
        with loop._lock:
            if loop._pending_opts is None:
                break
        _time.sleep(0.1)
    assert loop.error is None, loop.error
    assert loop.renderer.options.num_bounces == 3
    assert loop.renderer.options.all_devices is True
    assert loop.renderer.num_devices == 8
