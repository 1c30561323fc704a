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
    loop = RenderLoop(renderer, Camera())
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
    assert {"frame", "steps", "ms", "fps", "resets", "error"} <= set(s)
    assert s["error"] is None
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(srv, "/nonexistent")


def test_state_surfaces_render_error(server):
    srv, loop = server
    loop.error = RuntimeError("boom")
    s = json.loads(_get(srv, "/state").read())
    assert "boom" in s["error"]
    loop.error = None


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
