"""Editor command-surface fuzz: random op sequences preserve invariants.

The viewer drives SceneEditor with arbitrary JSON; whatever the sequence,
the scene must stay internally consistent (material references in range,
TRS-representable model transforms, buildable device scene) and invalid
payloads must surface as EditError — never a raw TypeError/ValueError or
a silently corrupted scene (SURVEY §4's determinism story depends on the
host model staying sane under editing)."""
import math

import numpy as np
import pytest

from simple_raytracer_tpu import Material, Scene
from simple_raytracer_tpu.editor import EditError, SceneEditor

KINDS = ("sphere", "plane", "model")


def _pick(rng, options):
    """rng.choice for ragged/mixed-type option lists."""
    return options[int(rng.integers(len(options)))]


def _rand_op(rng, sc):
    """One random (op, payload) — sometimes deliberately malformed."""
    ops = [
        lambda: {"op": "add_sphere",
                 "position": list(rng.uniform(-5, 5, 3)),
                 "radius": float(rng.uniform(0.1, 2.0))},
        lambda: {"op": "add_plane",
                 "position": list(rng.uniform(-5, 5, 3)),
                 "normal": list(rng.uniform(-1, 1, 3) + 1e-3)},
        lambda: {"op": "add_box",
                 "position": list(rng.uniform(-5, 5, 3))},
        lambda: {"op": "add_material", "name": f"m{rng.integers(1e6)}",
                 "fields": {"metallic": float(rng.uniform(0, 1))}},
        lambda: {"op": "remove_shape",
                 "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6))},
        lambda: {"op": "duplicate_shape",
                 "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6))},
        lambda: {"op": "reorder_shape", "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6)),
                 "to": rng.choice([None, -3, 0, 2, 99])},
        lambda: {"op": "set_shape_material", "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6)),
                 "material": _pick(rng, [None, -1, 0, 1, 17])},
        lambda: {"op": "remove_material",
                 "index": _pick(rng, [None, -1, 0, 1, 5])},
        lambda: {"op": "update_material", "index": int(rng.integers(0, 4)),
                 "fields": {"smoothness": _pick(rng, [0.5, None, "x"])}},
        lambda: {"op": "translate_shape", "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6)),
                 "delta": _pick(rng, [[0.1, 0, 0], [1], None])},
        lambda: {"op": "rotate_shape", "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6)),
                 "axis": [0, 1, 0],
                 "angle": float(rng.uniform(-3, 3))},
        lambda: {"op": "scale_shape", "kind": rng.choice(KINDS),
                 "index": int(rng.integers(-2, 6)),
                 "factor": _pick(rng, [0.5, 2.0, 0.0, -1.0]),
                 "axis": _pick(rng, [None, "x", "y", "z", "w"])},
        lambda: {"op": "set_camera", "fov": _pick(rng, [70, None, "x"])},
        lambda: {"op": _pick(rng, ["frobnicate", "", None])},
    ]
    return ops[rng.integers(len(ops))]()


def _check_invariants(sc: Scene):
    n_mats = len(sc.materials)
    assert n_mats >= 1                      # delete refills Material0
    for shape in sc.all_shapes:
        assert 0 <= shape.material < n_mats
    for m in sc.models:
        t = np.asarray(m.transform, np.float64)
        assert t.shape == (4, 4) and np.isfinite(t).all()
        assert abs(np.linalg.det(t[:3, :3])) > 0  # never collapsed
    for s in sc.spheres:
        assert s.radius > 0 and math.isfinite(s.radius)
    # identity discipline: no aliased objects in any list
    for lst in (sc.spheres, sc.planes, sc.models):
        ids = [id(x) for x in lst]
        assert len(ids) == len(set(ids))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_editor_random_ops_keep_scene_consistent(seed):
    rng = np.random.default_rng(seed)
    sc = Scene()
    ed = SceneEditor(sc, on_change=lambda: None)
    applied = failed = 0
    for _ in range(300):
        cmd = _rand_op(rng, sc)
        try:
            r = ed.apply(cmd)
            assert r.get("ok", True) in (True, False)
            applied += 1
        except EditError:
            failed += 1          # structured rejection is the contract
        _check_invariants(sc)
    # the mix must actually exercise both outcomes
    assert applied > 50 and failed > 20

    # whatever state the fuzz left: the scene still compiles to a valid
    # device scene
    ds = sc.build()
    assert int(ds.materials.smoothness.shape[0]) >= len(sc.materials)


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzzed_scene_json_roundtrip_renders_identically(seed, tmp_path):
    """Whatever state a fuzz run leaves, save_scene -> load_scene must
    reproduce a scene whose DEVICE build is array-for-array identical —
    the scene file IS the persistence story (reference future work,
    README.md:43), so it must round-trip arbitrary edited scenes, not
    just the presets."""
    import jax
    from simple_raytracer_tpu.io.scene_json import load_scene, save_scene

    rng = np.random.default_rng(seed)
    sc = Scene()
    ed = SceneEditor(sc, on_change=lambda: None)
    for _ in range(200):
        try:
            ed.apply(_rand_op(rng, sc))
        except EditError:
            pass
    path = tmp_path / "fuzzed.json"
    save_scene(path, sc)
    sc2, _ = load_scene(path)

    a, b = sc.build(), sc2.build()
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert sc2.materials.names == sc.materials.names


@pytest.mark.parametrize("seed", [3, 7])
def test_random_scene_scan_vs_megakernel_parity(seed):
    """Randomly composed scenes (spheres/planes/boxes, random materials
    incl. emissive/metallic/transmissive) must render the same through
    the dense XLA scan and the fused megakernel (interpret mode): the
    paths share rng/bsdf/vec sources, so disagreement beyond Bernoulli
    flip noise means a kernel semantics bug that the fixed presets
    happen not to exercise."""
    import jax.numpy as jnp
    from simple_raytracer_tpu.ops.trace import make_render_step

    rng = np.random.default_rng(seed)
    sc = Scene()
    for _ in range(rng.integers(2, 6)):
        mi = sc.add_material(Material(
            smoothness=float(rng.uniform(0, 1)),
            metallic=float(rng.uniform(0, 1)),
            specular=float(rng.uniform(0, 0.5)),
            transmittance=float(rng.uniform(0, 1) > 0.7),
            refraction_index=float(rng.uniform(1.05, 2.0)),
            emission=tuple(rng.uniform(0, 1, 3)),
            emission_strength=float(rng.uniform(0, 3)),
            color=tuple(rng.uniform(0.1, 1, 3))))
    n_mats = len(sc.materials)
    for _ in range(rng.integers(1, 6)):
        sc.add_sphere(tuple(rng.uniform(-4, 4, 3) * [1, 1, 1] - [0, 0, 4]),
                      float(rng.uniform(0.3, 1.5)),
                      material=int(rng.integers(n_mats)))
    if rng.random() > 0.3:
        sc.add_plane((0, -1.5, 0), (0, 1, 0),
                     material=int(rng.integers(n_mats)))
    if rng.random() > 0.5:
        sc.add_box(tuple(rng.uniform(-3, 3, 3) - [0, 0, 4]),
                   material=int(rng.integers(n_mats)))

    ds = sc.build()
    from simple_raytracer_tpu import Camera
    cam = Camera().state(32 / 24)
    outs = []
    for backend in ("jnp", "fused"):
        f = make_render_step(32, 24, 2, 4, tri_backend=backend,
                             ray_tile=None, jit=False)
        c = jnp.zeros((24, 32, 3), jnp.float32)
        outs.append(np.asarray(f(ds, cam, c, jnp.uint32(seed + 100))))
    a, b = outs
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    agree = float(np.mean(np.all(np.abs(a - b) < 1e-3, axis=-1)))
    assert rmse < 1e-2, f"seed {seed}: rmse {rmse}"
    assert agree > 0.97, f"seed {seed}: only {agree:.3f} pixels agree"
