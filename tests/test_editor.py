"""SceneEditor command-surface tests (the ImGui editor verbs,
interface.cpp:106-480, as JSON commands)."""
import math

import numpy as np
import pytest

from simple_raytracer_tpu.editor import EditError, SceneEditor, decompose_trs
from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.models.shapes import transform_trs


@pytest.fixture()
def ed():
    changes = []
    sc = Scene()
    editor = SceneEditor(sc, on_change=lambda: changes.append(1))
    editor.changes = changes
    return editor


def test_add_and_describe(ed):
    r = ed.apply({"op": "add_sphere", "position": [1, 2, 3], "radius": 0.5})
    assert r["ok"] and r["changed"] and r["index"] == 0
    ed.apply({"op": "add_plane"})
    ed.apply({"op": "add_box", "position": [0, 0, -4], "size": [1, 2, 3]})
    d = ed.describe()
    kinds = [s["kind"] for s in d["shapes"]]
    assert kinds == ["sphere", "plane", "model"]
    assert d["shapes"][0]["position"] == [1, 2, 3]
    assert d["shapes"][2]["triangles"] == 12
    np.testing.assert_allclose(d["shapes"][2]["scale"], [0.5, 1.0, 1.5])
    assert len(ed.changes) == 3


def test_duplicate_and_remove(ed):
    ed.apply({"op": "add_sphere"})
    r = ed.apply({"op": "duplicate_shape", "kind": "sphere", "index": 0})
    assert r["index"] == 1
    assert len(ed.scene.spheres) == 2
    ed.apply({"op": "remove_shape", "kind": "sphere", "index": 0})
    assert len(ed.scene.spheres) == 1
    with pytest.raises(EditError):
        ed.apply({"op": "remove_shape", "kind": "sphere", "index": 5})


def test_set_shape_sphere_and_plane(ed):
    ed.apply({"op": "add_sphere"})
    ed.apply({"op": "set_shape", "kind": "sphere", "index": 0,
              "position": [4, 5, 6], "radius": -2.0})
    s = ed.scene.spheres[0]
    assert s.position == (4, 5, 6) and s.radius == 2.0   # radius clamped
    ed.apply({"op": "add_plane"})
    ed.apply({"op": "set_shape", "kind": "plane", "index": 0,
              "normal": [0, 0, 2]})
    np.testing.assert_allclose(ed.scene.planes[0].normal, [0, 0, 1])
    with pytest.raises(EditError):
        ed.apply({"op": "set_shape", "kind": "plane", "index": 0,
                  "normal": [0, 0, 0]})


def test_model_trs_roundtrip(ed):
    ed.apply({"op": "add_box"})
    rot = (0.3, -0.4, 0.2)
    ed.apply({"op": "set_shape", "kind": "model", "index": 0,
              "translation": [1, 2, 3], "rotation": list(rot),
              "scale": [2, 2, 2]})
    m = ed.scene.models[0]
    np.testing.assert_allclose(m.transform,
                               transform_trs((1, 2, 3), rot, (2, 2, 2)),
                               atol=1e-6)
    t, r, s = decompose_trs(m.transform)
    np.testing.assert_allclose(t, [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(r, rot, atol=1e-5)
    np.testing.assert_allclose(s, [2, 2, 2], rtol=1e-5)


def test_translate_shape_gizmo_drag(ed):
    ed.apply({"op": "add_sphere", "position": [0, 0, 0]})
    ed.apply({"op": "add_box", "position": [1, 0, 0]})
    ed.apply({"op": "translate_shape", "kind": "sphere", "index": 0,
              "delta": [0.5, 0, -1]})
    assert ed.scene.spheres[0].position == (0.5, 0.0, -1.0)
    ed.apply({"op": "translate_shape", "kind": "model", "index": 0,
              "delta": [0, 2, 0]})
    np.testing.assert_allclose(ed.scene.models[0].transform[:3, 3],
                               [1, 2, 0])


def test_material_verbs(ed):
    r = ed.apply({"op": "add_material", "name": "Shiny",
                  "fields": {"smoothness": 0.9, "color": [1, 0, 0]}})
    idx = r["index"]
    assert ed.scene.materials.names[idx] == "Shiny"
    ed.apply({"op": "update_material", "index": idx,
              "fields": {"transmittance": 1.0, "refraction_index": 1.5}})
    assert ed.scene.materials[idx].refraction_index == 1.5
    r = ed.apply({"op": "rename_material", "index": idx, "name": "Glass"})
    assert not r["changed"]   # rename is host-only: no accumulation reset
    ed.apply({"op": "add_sphere", "material": idx})
    ed.apply({"op": "remove_material", "index": idx})
    assert ed.scene.spheres[0].material == 0   # reindex semantics
    with pytest.raises(EditError):
        ed.apply({"op": "update_material", "index": 99, "fields": {}})
    with pytest.raises(EditError):
        ed.apply({"op": "update_material", "index": 0,
                  "fields": {"bogus": 1}})


def test_set_shape_material(ed):
    m = ed.apply({"op": "add_material"})["index"]
    ed.apply({"op": "add_sphere"})
    ed.apply({"op": "set_shape_material", "kind": "sphere", "index": 0,
              "material": m})
    assert ed.scene.spheres[0].material == m
    with pytest.raises(EditError):
        ed.apply({"op": "set_shape_material", "kind": "sphere", "index": 0,
                  "material": 77})


def test_set_sky(ed):
    ed.apply({"op": "set_sky", "fields": {"sun_intensity": 3.0,
                                          "sun_direction": [2, 0, 0],
                                          "zenith_color": [0.1, 0.2, 0.3]}})
    assert ed.scene.sky.sun_intensity == 3.0
    np.testing.assert_allclose(ed.scene.sky.sun_direction, [1, 0, 0])
    with pytest.raises(EditError):
        ed.apply({"op": "set_sky", "fields": {"nope": 1}})


def test_import_model_error(ed, tmp_path):
    with pytest.raises(EditError, match="Inexistant file"):
        ed.apply({"op": "import_model", "path": "/nonexistent/m.stl"})
    # and a real import works
    from simple_raytracer_tpu.io.stl import save_stl
    pos = np.zeros((3, 3, 3), np.float32)
    pos[:, 1, 0] = 1.0
    pos[:, 2, 1] = 1.0
    p = tmp_path / "tri.stl"
    save_stl(p, pos)
    r = ed.apply({"op": "import_model", "path": str(p)})
    assert r["triangles"] == 3


def test_unknown_op(ed):
    with pytest.raises(EditError):
        ed.apply({"op": "frobnicate"})
    with pytest.raises(EditError):
        ed.apply("not a dict")


def test_pick(ed):
    ed.apply({"op": "add_sphere", "position": [0, 0, -5], "radius": 1.0})
    ed.apply({"op": "add_plane", "position": [0, -2, 0],
              "normal": [0, 1, 0]})
    ed.apply({"op": "add_box", "position": [4, 0, -5]})
    # straight down the -z axis: sphere first
    assert ed.pick((0, 0, 0), (0, 0, -1)) == {"kind": "sphere", "index": 0}
    # down: the plane
    assert ed.pick((0, 0, 0), (0, -1, 0)) == {"kind": "plane", "index": 0}
    # toward the box
    assert ed.pick((4, 0, 0), (0, 0, -1)) == {"kind": "model", "index": 0}
    # into empty sky
    assert ed.pick((0, 0, 0), (0, 1, 0)) is None


def test_repair_selection_rules():
    """The selection-index arithmetic for structural edits — previously
    client-side JS (two shipped bugs, round-3 VERDICT), now the pure
    server function the browser adopts verbatim."""
    from simple_raytracer_tpu.editor import repair_selection as rs
    sel = {"kind": "sphere", "index": 3}
    rm = {"op": "remove_shape", "kind": "sphere"}
    # delete below / at / above the selection
    assert rs(sel, dict(rm, index=1), {}) == {"kind": "sphere", "index": 2}
    assert rs(sel, dict(rm, index=3), {}) is None
    assert rs(sel, dict(rm, index=4), {}) == sel
    # other kind never touches it
    assert rs(sel, {"op": "remove_shape", "kind": "plane", "index": 0},
              {}) == sel
    ro = {"op": "reorder_shape", "kind": "sphere"}
    # the dragged shape follows its landing index
    assert rs(sel, dict(ro, index=3, to=0), {"index": 0}) == {
        "kind": "sphere", "index": 0}
    # shapes between source and destination shift toward the source
    assert rs(sel, dict(ro, index=1, to=3), {"index": 3}) == {
        "kind": "sphere", "index": 2}
    assert rs(sel, dict(ro, index=5, to=2), {"index": 2}) == {
        "kind": "sphere", "index": 4}
    # outside the moved span: untouched
    assert rs(sel, dict(ro, index=5, to=4), {"index": 4}) == sel
    # duplicate inserted at/below the selection shifts it up; clamped
    # 'to' comes from the RESULT, not the request
    assert rs(sel, {"op": "duplicate_shape", "kind": "sphere", "index": 1},
              {"index": 2}) == {"kind": "sphere", "index": 4}
    assert rs(sel, {"op": "duplicate_shape", "kind": "sphere", "index": 4},
              {"index": 5}) == sel
    # junk selections resolve to None instead of raising
    assert rs("zap", dict(rm, index=0), {}) is None
    assert rs({"kind": "sphere", "index": "x"}, dict(rm, index=0), {}) is None
    # non-structural ops pass the selection through
    assert rs(sel, {"op": "set_shape_material", "kind": "sphere",
                    "index": 3, "material": 1}, {}) == sel
