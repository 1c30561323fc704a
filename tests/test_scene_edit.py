"""Scene editing API tests (the ImGui editor verbs, interface.cpp)."""
import numpy as np
import pytest

from simple_raytracer_tpu import Material, Scene
from simple_raytracer_tpu.io.stl import save_stl
from simple_raytracer_tpu.models.shapes import transform_trs


def test_remove_and_duplicate_shape():
    sc = Scene()
    s = sc.add_sphere((0, 0, 0), 1.0)
    b = sc.add_box((1, 0, 0))
    d = sc.duplicate_shape(s)
    assert len(sc.spheres) == 2
    d.position = (5, 0, 0)
    assert sc.spheres[0].position == (0, 0, 0)  # deep copy
    sc.remove_shape(s)
    assert sc.spheres == [d]
    dup_box = sc.duplicate_shape(b)
    # instancing: duplicate shares the triangle span
    assert dup_box.triangle_index == b.triangle_index
    assert len(sc.pool) == 12
    sc.remove_shape(b)
    with pytest.raises(ValueError):
        sc.remove_shape(b)


def test_set_material_bounds():
    sc = Scene()
    s = sc.add_sphere((0, 0, 0), 1.0)
    m = sc.add_material(Material(color=(1, 0, 0)), "Red")
    sc.set_material(s, m)
    assert s.material == m
    with pytest.raises(IndexError):
        sc.set_material(s, 99)


def test_remove_material_reindexes():
    sc = Scene()
    a = sc.add_material(Material(), "A")
    b = sc.add_material(Material(), "B")
    s1 = sc.add_sphere((0, 0, 0), 1, material=a)
    s2 = sc.add_plane((0, -1, 0), (0, 1, 0), material=b)
    sc.remove_material(a)
    assert s1.material == 0 and s2.material == 1


def test_set_model_transform_changes_device_scene():
    sc = Scene()
    m = sc.add_box((0, 0, 0))
    d1 = sc.build()
    sc.set_model_transform(m, transform_trs((3, 0, 0)))
    d2 = sc.build()
    # world-space triangles moved by +3 in x
    x1 = np.asarray(d1.triangles.v0.x)[np.asarray(d1.triangles.active)]
    x2 = np.asarray(d2.triangles.v0.x)[np.asarray(d2.triangles.active)]
    np.testing.assert_allclose(np.sort(x2), np.sort(x1) + 3.0, rtol=1e-6)


def test_import_model(tmp_path):
    pos = np.zeros((3, 3, 3), np.float32)
    pos[:, 1, 0] = 1.0
    pos[:, 2, 1] = 1.0
    p = tmp_path / "tri.stl"
    save_stl(p, pos)
    sc = Scene()
    m = sc.import_model(p, transform=transform_trs((0, 0, -5)))
    assert m.num_triangles == 3
    assert len(sc.pool) == 3
    with pytest.raises(FileNotFoundError):
        sc.import_model(tmp_path / "missing.obj")


def test_shape_reorder_is_list_order():
    # the editor's drag-drop reorder = plain list manipulation
    sc = Scene()
    s1 = sc.add_sphere((0, 0, 0), 1.0)
    s2 = sc.add_sphere((1, 0, 0), 1.0)
    sc.spheres.reverse()
    assert sc.spheres == [s2, s1]
    ds = sc.build()
    assert float(ds.spheres.center.x[0]) == 1.0


def test_rotate_and_scale_shape_ops():
    """rotate_shape / scale_shape editor verbs (gizmo rotate/scale modes,
    interface.cpp:13-104)."""
    import math

    import numpy as np

    from simple_raytracer_tpu.editor import EditError, SceneEditor
    from simple_raytracer_tpu.models.meshgen import torus
    from simple_raytracer_tpu.models.shapes import transform_trs

    sc = Scene()
    sc.add_sphere((1, 2, 3), 1.5)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    pos, nrm = torus()
    span = sc.pool.append(pos, nrm)
    sc.add_model(span, transform=transform_trs((0, 0, -4)))
    changes = []
    ed = SceneEditor(sc, on_change=lambda: changes.append(1))

    # model rotation: 90 deg about world Y maps +x column onto -z
    m0 = np.array(sc.models[0].transform)
    ed.apply({"op": "rotate_shape", "kind": "model", "index": 0,
              "axis": [0, 1, 0], "angle": math.pi / 2})
    m1 = np.array(sc.models[0].transform)
    np.testing.assert_allclose(m1[:3, 3], m0[:3, 3], atol=1e-6)  # in place
    np.testing.assert_allclose(m1[:3, 0], [0, 0, -1], atol=1e-6)

    # plane normal rotation: 90 deg about world X: +y -> +z
    ed.apply({"op": "rotate_shape", "kind": "plane", "index": 0,
              "axis": [1, 0, 0], "angle": math.pi / 2})
    np.testing.assert_allclose(sc.planes[0].normal, [0, 0, 1], atol=1e-6)

    # sphere rotation: accepted no-op, does NOT reset accumulation
    n_changes = len(changes)
    r = ed.apply({"op": "rotate_shape", "kind": "sphere", "index": 0})
    assert r["ok"] and not r["changed"] and len(changes) == n_changes

    # scaling
    ed.apply({"op": "scale_shape", "kind": "sphere", "index": 0,
              "factor": 2.0})
    assert sc.spheres[0].radius == 3.0
    ed.apply({"op": "scale_shape", "kind": "model", "index": 0,
              "factor": 0.5})
    m2 = np.array(sc.models[0].transform)
    np.testing.assert_allclose(np.linalg.norm(m2[:3, :3], axis=0), 0.5,
                               atol=1e-6)
    np.testing.assert_allclose(m2[:3, 3], m1[:3, 3], atol=1e-6)

    import pytest

    with pytest.raises(EditError):
        ed.apply({"op": "scale_shape", "kind": "plane", "index": 0,
                  "factor": 2.0})
    with pytest.raises(EditError):
        ed.apply({"op": "scale_shape", "kind": "sphere", "index": 0,
                  "factor": 0.0})
    with pytest.raises(EditError):
        ed.apply({"op": "rotate_shape", "kind": "model", "index": 0,
                  "axis": [0, 0, 0], "angle": 1.0})


def test_skybox_swap_invalidates_device_cache():
    """Replacing scene.skybox with a NEW array must rebuild the device
    texture: the cache compares the array object itself (`is`), not a
    bare id() key — id reuse after the old array is freed must not
    resurrect the stale texture."""
    import numpy as np
    from simple_raytracer_tpu.models.scene import Scene
    from simple_raytracer_tpu.ops.scene_types import SkyboxTex

    sc = Scene()

    def flat(val):
        u8 = np.full((4, 8, 3), val, np.uint8)
        return np.power(u8.astype(np.float32) / 255.0, np.float32(2.2),
                        dtype=np.float32)

    sc.skybox = flat(10)
    tex_a = sc.build().skybox
    assert isinstance(tex_a, SkyboxTex)
    # same object -> cache hit (identical device rep)
    assert sc.build().skybox is tex_a
    # drop the old array and install a fresh one (new contents): a stale
    # id()-keyed cache could collide here when CPython reuses the address
    sc.skybox = flat(200)
    tex_b = sc.build().skybox
    assert tex_b is not tex_a
    assert not np.array_equal(np.asarray(tex_b.quad), np.asarray(tex_a.quad))


def test_reorder_with_duplicate_shapes_moves_the_indexed_object():
    """Dataclass shapes compare by VALUE, so a reorder that removed by
    equality (list.remove) would delete the first equal element when a
    duplicate exists — aliasing one object at two indices and losing the
    original.  Reorder must pop by index."""
    from simple_raytracer_tpu.editor import SceneEditor

    sc = Scene()
    ed = SceneEditor(sc, on_change=lambda: None)
    ed.apply({"op": "add_sphere", "position": [0, 0, -3], "radius": 1.0})
    ed.apply({"op": "add_sphere", "position": [2, 0, -3], "radius": 0.5})
    ed.apply({"op": "duplicate_shape", "kind": "sphere", "index": 0})
    ids = [id(s) for s in sc.spheres]
    assert len(set(ids)) == 3            # three DISTINCT objects

    r = ed.apply({"op": "reorder_shape", "kind": "sphere", "index": 2,
                  "to": 0})
    assert r["ok"] and r["index"] == 0
    new_ids = [id(s) for s in sc.spheres]
    assert len(set(new_ids)) == 3        # still three distinct objects
    assert new_ids == [ids[2], ids[0], ids[1]]


def test_remove_shape_matches_by_identity():
    """remove_shape must delete THE object, not the first value-equal
    one: dataclass shapes compare by value (a duplicated sphere equals
    its source) and a Model's ndarray transform makes == raise."""
    from simple_raytracer_tpu.models.scene import Scene

    sc = Scene()
    s0 = sc.add_sphere((0, 0, -3), 1.0)
    dup = sc.duplicate_shape(s0)
    sc.remove_shape(dup)
    assert sc.spheres == [s0] and sc.spheres[0] is s0

    # two equal-except-transform boxes: Model.__eq__ raises on ndarray
    # fields, so any equality-based membership test would crash here
    b0 = sc.add_box((0, 0, -5))
    b1 = sc.add_box((2, 0, -5))
    sc.remove_shape(b1)
    assert len(sc.models) == 1 and sc.models[0] is b0


def test_auto_cluster_k_escalates_when_padded_table_leaves_vmem():
    """The auto cluster-size decision is made from the PADDED table the
    kernel actually sees: a mesh whose raw triangle count fits the VMEM
    slot budget but whose bucket-padded K=64 table does not must pick
    K=128 (the documented HBM-streaming choice), and the decision is
    cached per topology so gizmo refits can't flip it (K is a jit key)."""
    import numpy as np
    from simple_raytracer_tpu.models.meshgen import torus
    from simple_raytracer_tpu.models.scene import Scene
    from simple_raytracer_tpu.models.shapes import Model
    from simple_raytracer_tpu.ops.pallas.bvh_kernel import \
        VMEM_TABLE_MAX_SLOTS

    pos, nrm = torus(n_major=63, n_minor=62)       # 7812 < 8192 raw tris
    sc = Scene()
    start, count = sc.pool.append(pos, nrm)
    sc.models.append(Model(material=0, triangle_index=start,
                           num_triangles=count,
                           transform=np.eye(4, dtype=np.float32)))
    ds = sc.build()
    cl = ds.triangles.clusters
    k = sc._auto_k[1]
    # invariant: K=64 only while the padded table is VMEM-resident
    if cl.table_t.shape[0] > VMEM_TABLE_MAX_SLOTS:
        assert k == 128
    # this specific mesh is in the escalation band
    assert k == 128

    # refit reuses the cached decision and topology
    topo_before = sc._cluster_topo[1]
    sc.models[0].transform = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    sc.build(refit=True)
    assert sc._auto_k[1] == 128
    assert sc._cluster_topo[1].slots is topo_before.slots  # topology kept


def test_axis_scale_is_local_and_trs_representable():
    """Per-axis model scale acts in the LOCAL frame (tiny-gizmo edits an
    object-frame scale vec3): on a rotated model the matrix must remain
    T*R*S-decomposable, so a follow-up TRS-based translation cannot snap
    the geometry."""
    import math as _math
    from simple_raytracer_tpu.editor import SceneEditor, decompose_trs

    sc = Scene()
    box = sc.add_box((0, 0, -5))
    ed = SceneEditor(sc, on_change=lambda: None)
    ed.apply({"op": "rotate_shape", "kind": "model", "index": 0,
              "axis": [0, 1, 0], "angle": _math.pi / 4})
    ed.apply({"op": "scale_shape", "kind": "model", "index": 0,
              "factor": 2.0, "axis": "x"})
    m = np.array(sc.models[0].transform, np.float64)
    t, (yaw, pitch, roll), scale = decompose_trs(m.astype(np.float32))
    np.testing.assert_allclose(scale, [2.0, 1.0, 1.0], atol=1e-5)
    # recompose must reproduce the matrix (no shear lost)
    m2 = transform_trs(t, (yaw, pitch, roll), scale)
    np.testing.assert_allclose(np.asarray(m2, np.float64), m, atol=1e-5)


def test_remove_material_rejects_negative_index():
    from simple_raytracer_tpu.editor import SceneEditor

    sc = Scene()
    sc.add_material(Material(), "M1")
    s = sc.add_sphere((0, 0, -3), 1.0, material=1)
    ed = SceneEditor(sc, on_change=lambda: None)
    import pytest
    from simple_raytracer_tpu.editor import EditError
    with pytest.raises(EditError, match="material"):
        ed.apply({"op": "remove_material", "index": -1})
    assert s.material == 1      # nothing was reindexed

    with pytest.raises(IndexError):
        sc.materials.remove(-1, sc.all_shapes)
