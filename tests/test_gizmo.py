"""Depth-correct 3-D gizmo handles: world-space hit tests, occlusion,
and the pick -> axis-drag -> TRS flow through the viewer endpoints
(the tiny-gizmo fidelity item, tiny-gizmo.cpp:115-134,309-327)."""
import json
import math
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from simple_raytracer_tpu import Camera, Renderer, RenderOptions, Scene
from simple_raytracer_tpu.gizmo import (AXES, handle_scale, handle_capsules,
                                        polylines, ray_hit, _ring_basis)
from simple_raytracer_tpu.viewer import (RenderLoop, ThreadingHTTPServer,
                                         make_handler)

FOV = math.radians(60.0)


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


# ---------------------------------------------------------------- unit --

@pytest.mark.parametrize("mode", ["translate", "scale"])
@pytest.mark.parametrize("axis", ["x", "y", "z"])
def test_arrow_hit_from_oblique_camera(mode, axis):
    """A ray aimed at each arrow's TIP grabs that axis, from a camera
    that is nowhere near axis-aligned."""
    center = np.array([1.0, 2.0, -3.0])
    cam = np.array([4.0, 3.5, 2.0])
    s = handle_scale(center, cam, FOV)
    target = center + 1.15 * s * AXES[axis]
    hit = ray_hit(cam, _norm(target - cam), center, mode, s)
    assert hit is not None and hit[0] == axis
    # the reported t is where the ray ENTERS the tip capsule: between
    # the camera and the aim point, within the tip radius
    dist = np.linalg.norm(target - cam)
    assert dist - 0.25 * s <= hit[1] <= dist + 1e-9


@pytest.mark.parametrize("axis", ["x", "y", "z"])
def test_ring_hit(axis):
    """rotate mode: a ray at a point ON the ring circle grabs the ring's
    axis."""
    center = np.array([0.0, 0.5, -4.0])
    cam = np.array([2.0, 3.0, 1.0])
    s = handle_scale(center, cam, FOV)
    u, v = _ring_basis(AXES[axis])
    for ang in (0.3, 2.0, 4.4):
        p = center + 1.0 * s * (math.cos(ang) * u + math.sin(ang) * v)
        hit = ray_hit(cam, _norm(p - cam), center, "rotate", s)
        assert hit is not None and hit[0] == axis, (axis, ang, hit)


def test_grazing_angle_grab():
    """A handle nearly PARALLEL to the view ray (the case screen-space
    segments degenerate to a point on) still grabs in world space: the
    z arrow seen almost head-on."""
    center = np.array([0.0, 0.0, -3.0])
    cam = np.array([0.05, 0.03, 5.0])          # almost down the z axis
    s = handle_scale(center, cam, FOV)
    target = center + 1.15 * s * AXES["z"]     # tip pointing AT the camera
    hit = ray_hit(cam, _norm(target - cam), center, "translate", s)
    assert hit is not None and hit[0] == "z"


def test_miss_and_nearest_axis_priority():
    center = np.array([0.0, 0.0, -3.0])
    cam = np.array([0.0, 0.0, 5.0])
    s = handle_scale(center, cam, FOV)
    assert ray_hit(cam, _norm([0.0, 1.0, 0.2]), center, "translate",
                   s) is None
    # a ray through the shared origin region: SOME axis wins and it is
    # the first capsule entered (t minimal over all handles)
    hit = ray_hit(cam, _norm(center + 0.3 * s * AXES["x"] - cam),
                  center, "translate", s)
    assert hit is not None and hit[1] > 0


def test_capsules_and_polylines_cover_same_extent():
    """The drawn polylines trace the hit-test capsules: every polyline
    vertex lies inside/on the swept surface of its axis' capsule chain
    (so what the user sees is what the hit test grabs)."""
    center = np.array([2.0, -1.0, 0.5])
    s = 0.8
    for mode in ("translate", "rotate", "scale"):
        caps = handle_capsules(center, mode, s)
        polys = polylines(center, mode, s)
        for ax, pts in polys.items():
            for p in pts:
                dmin = min(_seg_dist(p, p0, p1) - r
                           for p0, p1, r in caps[ax])
                assert dmin <= 1e-9, (mode, ax, dmin)


def _seg_dist(p, a, b):
    ab = b - a
    t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-30), 0.0, 1.0)
    return float(np.linalg.norm(p - (a + t * ab)))


# ------------------------------------------------------------ endpoints --

@pytest.fixture()
def server():
    sc = Scene()
    sc.add_sphere((0, 0, -3), 1.0)
    # same static shape as the test_viewer fixture: one shared compile
    opts = RenderOptions(width=32, height=24, num_samples=1,
                         num_bounces=2)
    renderer = Renderer(opts, scene=sc)
    loop = RenderLoop(renderer, Camera(position=(0.0, 0.0, 5.0)), scene=sc)
    loop.start()
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(loop, 32, 24))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, loop
    srv.shutdown()
    loop.stop()


def _post(srv, path, payload):
    port = srv.server_address[1]
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=json.dumps(payload).encode(),
                                 method="POST")
    return json.loads(urllib.request.urlopen(req, timeout=10).read())


GIZMO = {"kind": "sphere", "index": 0, "mode": "translate"}


def _tip_pixel(overlay, axis):
    """The projected tip vertex of an arrow (polylines: index 3) and its
    occlusion flag."""
    a = overlay[axis]
    return a["pts"][3], a["occ"][3]


def test_pick_grabs_visible_handle_and_axis_drag_moves_trs(server):
    """The full reference flow: /input ships the projected handles, a
    click on the drawn x-arrow tip returns gizmo_axis=x, and the
    axis-constrained drag moves the shape along world x ONLY."""
    srv, loop = server
    s = _post(srv, "/input", {"keys": [], "dx": 0, "dy": 0, "wheel": 0,
                              "dt": 0.0, "gizmo": GIZMO})
    assert s["gizmo"] is not None
    (px, py), occ = _tip_pixel(s["gizmo"], "x")
    assert not occ          # nothing between the camera and the x tip
    hit = _post(srv, "/pick", {"x": px, "y": py, "gizmo": GIZMO})
    assert hit["gizmo_axis"] == "x"

    pos0 = loop.scene.spheres[0].position
    r = _post(srv, "/edit", {"op": "drag_shape", "kind": "sphere",
                             "index": 0, "mode": "translate", "axis": "x",
                             "dx": 0.1, "dy": 0.0})
    assert r["ok"]
    pos1 = loop.scene.spheres[0].position
    assert pos1[0] != pos0[0]
    assert pos1[1] == pos0[1] and pos1[2] == pos0[2]


def test_pick_without_gizmo_field_keeps_old_contract(server):
    srv, _ = server
    hit = _post(srv, "/pick", {"x": 16, "y": 12})
    assert hit["shape"] == {"kind": "sphere", "index": 0}
    assert hit["gizmo_axis"] is None


def test_occluded_handle_cannot_be_grabbed(server):
    """A wall between the camera and the handles: the same click that
    grabbed the x arrow now picks the wall, and the overlay flags every
    handle vertex occluded — handles behind geometry are neither drawn
    solid nor clickable (tiny-gizmo's depth-correct behavior)."""
    srv, loop = server
    s = _post(srv, "/input", {"keys": [], "dx": 0, "dy": 0, "wheel": 0,
                              "dt": 0.0, "gizmo": GIZMO})
    (px, py), occ = _tip_pixel(s["gizmo"], "x")
    assert not occ
    r = _post(srv, "/edit", {"op": "add_plane", "position": [0, 0, 2],
                             "normal": [0, 0, 1]})
    assert r["ok"]
    hit = _post(srv, "/pick", {"x": px, "y": py, "gizmo": GIZMO})
    assert hit["gizmo_axis"] is None
    assert hit["shape"] == {"kind": "plane", "index": 0}
    s = _post(srv, "/input", {"keys": [], "dx": 0, "dy": 0, "wheel": 0,
                              "dt": 0.0, "gizmo": GIZMO})
    for ax in ("x", "y", "z"):
        assert all(s["gizmo"][ax]["occ"]), ax


def test_selected_shape_occludes_its_own_far_handles(server):
    """The -z part of handle geometry is INSIDE/behind the selected
    sphere from this camera: the overlay's z-ring far side must be
    flagged while near-side vertices stay visible (rotate mode rings
    straddle the shape)."""
    srv, loop = server
    gz = dict(GIZMO, mode="rotate")
    s = _post(srv, "/input", {"keys": [], "dx": 0, "dy": 0, "wheel": 0,
                              "dt": 0.0, "gizmo": gz})
    ring = s["gizmo"]["x"]       # ring around x: spans near AND far z
    assert any(ring["occ"]) and not all(ring["occ"])


def test_pick_rejects_malformed_gizmo(server):
    srv, _ = server
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/pick",
        data=json.dumps({"x": 1, "y": 1, "gizmo": "zap"}).encode(),
        method="POST")
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(req, timeout=10)
