"""Interactive progressive viewer: a thin local web client over the engine.

The reference is an interactive SDL2/ImGui app (src/main.cpp): fly camera
(WASD/Space/C + mouse-look, main.cpp:161-240), mouse-wheel fov zoom
(183-193), progressive accumulation that resets on any movement
(time_not_moved, 277-348), a 'p' screenshot key (319-322) and frame-time
readouts (interface.cpp:486-532).  The TPU engine is headless, so the
window becomes a browser page served by a stdlib HTTP server on localhost
— the client is NOT on the device path; it just posts input state and
pulls tonemapped PNG frames, exactly like SDL pulled the readback buffer.

Run:  python -m simple_raytracer_tpu.viewer --config 2 --port 8008
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


from .engine import Renderer, RenderOptions
from .models.camera import Camera
from .utils.metrics import FrameTimer

_PAGE = """<!doctype html>
<html><head><title>simple_raytracer_tpu</title><style>
 body { margin:0; background:#111; color:#ccc; font:13px monospace;
        display:flex; flex-direction:column; align-items:center }
 img  { image-rendering:pixelated; margin-top:8px; outline:1px solid #333 }
 #hud { padding:6px }
</style></head><body>
<div id=hud>click image to capture mouse &middot; WASD/Space/C move &middot;
 wheel zoom &middot; P screenshot (server-side out.ppm) &middot;
 <span id=stats></span></div>
<img id=view width=%(w)s height=%(h)s>
<script>
const keys = {}; let dx = 0, dy = 0, wheel = 0;
const img = document.getElementById('view');
img.onclick = () => img.requestPointerLock();
document.onkeydown = e => { keys[e.key.toLowerCase()] = true; };
document.onkeyup = e => { keys[e.key.toLowerCase()] = false; };
document.onmousemove = e => {
  if (document.pointerLockElement === img) { dx += e.movementX; dy += e.movementY; }
};
document.onwheel = e => { wheel += Math.sign(e.deltaY); };
let last = performance.now();
async function tick() {
  const now = performance.now(); const dt = (now - last) / 1000; last = now;
  const body = {keys: Object.keys(keys).filter(k => keys[k]),
                dx, dy, wheel, dt};
  dx = 0; dy = 0; wheel = 0;
  try {
    const r = await fetch('/input', {method:'POST', body: JSON.stringify(body)});
    const s = await r.json();
    document.getElementById('stats').textContent =
      `steps ${s.steps}  ${s.ms.toFixed(1)} ms/step  ${s.fps.toFixed(1)} fps`;
    img.src = '/frame.png?t=' + s.frame;
  } catch (e) {}
  setTimeout(tick, 33);
}
tick();
</script></body></html>"""


class RenderLoop:
    """Background progressive render loop with the reference's
    movement-resets-accumulation contract."""

    def __init__(self, renderer: Renderer, camera: Camera,
                 movement_speed: float = 15.0, look_speed: float = 25.0,
                 fps_limit: float = 60.0, screenshot_path: str = "out.ppm"):
        self.renderer = renderer
        self.camera = camera
        self.movement_speed = movement_speed
        self.look_speed = look_speed
        self.fps_limit = fps_limit  # 60 like the reference (main.cpp:153-155)
        self.screenshot_path = screenshot_path
        self.timer = FrameTimer()
        self._lock = threading.Lock()
        self._dirty = True
        self._frame_id = 0
        self.reset_count = 0   # accumulation restarts (observability)
        self.screenshot_count = 0
        self._png: bytes = b""
        self._screenshot_requested = False
        self._p_held = False   # edge-trigger: one press = one screenshot
        self.error: Exception = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # -- input (mirrors main.cpp:161-240) ---------------------------------
    def apply_input(self, keys, dx, dy, wheel, dt):
        with self._lock:
            moved = False
            h = (1.0 if "d" in keys else 0.0) - (1.0 if "a" in keys else 0.0)
            t = (1.0 if "s" in keys else 0.0) - (1.0 if "w" in keys else 0.0)
            v = (1.0 if " " in keys or "space" in keys else 0.0) - (
                1.0 if "c" in keys else 0.0)
            if h or t or v:
                self.camera.move(h, t, v, dt, self.movement_speed)
                moved = True
            if dx or dy:
                self.camera.look(dx, dy, dt, self.look_speed)
                moved = True
            if wheel:
                self.camera.zoom(-wheel)
                moved = True
            if moved:
                self._dirty = True  # time_not_moved = 1 (main.cpp:270-272)
            # 'p' screenshot (main.cpp:319-322): edge-triggered, and only a
            # FLAG is set here — the render thread saves after its step so
            # the HTTP thread never reads the canvas mid-mutation.
            p_now = "p" in keys
            if p_now and not self._p_held:
                self._screenshot_requested = True
            self._p_held = p_now

    def snapshot(self):
        with self._lock:
            return (self._png, self._frame_id, self.renderer.num_steps,
                    self.timer.avg * 1e3, self.timer.fps)

    def _run(self):
        try:
            self._run_inner()
        except Exception as e:  # surfaced via /state and tests
            self.error = e

    def _run_inner(self):
        from PIL import Image

        while not self._stop.is_set():
            with self._lock:
                if self._dirty:
                    self.renderer.clear_canvas()
                    self._dirty = False
                    self.reset_count += 1
                cam = Camera(position=self.camera.position,
                             yaw=self.camera.yaw, pitch=self.camera.pitch,
                             fov=self.camera.fov)
            t0 = time.perf_counter()
            # wall-clock RNG seed like the reference (main.cpp:287)
            seed = int(time.time() * 1000) & 0xFFFFFFFF or 1
            self.renderer.step(cam, time=seed)
            img = self.renderer.image()
            self.timer.record(time.perf_counter() - t0)
            buf = io.BytesIO()
            Image.fromarray(img, "RGB").save(buf, "PNG")
            with self._lock:
                self._png = buf.getvalue()
                self._frame_id += 1
                shoot = self._screenshot_requested
                self._screenshot_requested = False
            if shoot:
                from .io.image import save_ppm
                save_ppm(self.screenshot_path, img)
                self.screenshot_count += 1
            # FPS limiter (main.cpp:345-346: SDL_Delay to the cap)
            if self.fps_limit > 0:
                budget = 1.0 / self.fps_limit - (time.perf_counter() - t0)
                if budget > 0:
                    time.sleep(budget)


def make_handler(loop: RenderLoop, width: int, height: int):
    page = (_PAGE % {"w": width, "h": height}).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, page, "text/html")
            elif self.path.startswith("/frame.png"):
                png, *_ = loop.snapshot()
                if not png:
                    self._send(503, b"no frame yet", "text/plain")
                else:
                    self._send(200, png, "image/png")
            elif self.path.startswith("/state"):
                _, frame, steps, ms, fps = loop.snapshot()
                self._send(200, json.dumps(
                    {"frame": frame, "steps": steps, "ms": ms, "fps": fps,
                     "resets": loop.reset_count,
                     "screenshots": loop.screenshot_count,
                     "error": repr(loop.error) if loop.error else None,
                     }).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path == "/input":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    data = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, UnicodeDecodeError):
                    self._send(400, b"bad json", "text/plain")
                    return
                loop.apply_input(set(data.get("keys", [])),
                                 float(data.get("dx", 0)),
                                 float(data.get("dy", 0)),
                                 float(data.get("wheel", 0)),
                                 float(data.get("dt", 0.016)))
                _, frame, steps, ms, fps = loop.snapshot()
                self._send(200, json.dumps(
                    {"frame": frame, "steps": steps, "ms": ms,
                     "fps": fps}).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return Handler


def serve(scene, camera, options: RenderOptions, port: int = 8008,
          host: str = "127.0.0.1", fps_limit: float = 60.0,
          screenshot_path: str = "out.ppm"):
    renderer = Renderer(options, scene=scene)
    loop = RenderLoop(renderer, camera, fps_limit=fps_limit,
                      screenshot_path=screenshot_path)
    loop.start()
    server = ThreadingHTTPServer((host, port),
                                 make_handler(loop, options.width,
                                              options.height))
    print(f"viewer: http://{host}:{server.server_address[1]}/")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        loop.stop()
    return server


def main(argv=None):
    p = argparse.ArgumentParser(prog="srt-viewer")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene")
    src.add_argument("--config", type=int, choices=[1, 2, 3, 4, 5])
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=272)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("--bounces", type=int, default=6)
    p.add_argument("--fps-limit", type=float, default=60.0,
                   help="cap render loop fps (reference default: 60); 0 = off")
    p.add_argument("--screenshot-path", default="out.ppm",
                   help="where the P key saves the PPM screenshot")
    args = p.parse_args(argv)

    if args.scene:
        from .io.scene_json import load_scene
        scene, camera = load_scene(args.scene)
        camera = camera or Camera()
    else:
        from .models.presets import CONFIGS
        scene, camera, _ = CONFIGS[args.config]()
    options = RenderOptions(width=args.width, height=args.height,
                            num_samples=args.samples,
                            num_bounces=args.bounces)
    serve(scene, camera, options, port=args.port, fps_limit=args.fps_limit,
          screenshot_path=args.screenshot_path)


if __name__ == "__main__":
    main()
