"""Asset I/O tests: STL/OBJ fixtures (incl. negative indices, v//vn forms),
PPM round-trip, scene JSON round-trip."""
import numpy as np
import pytest

from simple_raytracer_tpu.io.image import load_ppm, save_ppm
from simple_raytracer_tpu.io.obj import load_obj_model, save_obj
from simple_raytracer_tpu.io.scene_json import load_scene, save_scene
from simple_raytracer_tpu.io.stl import load_stl_model, save_stl
from simple_raytracer_tpu.models import Camera, Material, Scene, TrianglePool


def test_stl_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pos = rng.normal(size=(7, 3, 3)).astype(np.float32)
    path = tmp_path / "mesh.stl"
    save_stl(path, pos)
    pool = TrianglePool()
    span = load_stl_model(path, pool)
    assert span == (0, 7)
    np.testing.assert_array_equal(pool.positions, pos)
    # flat shading: all three vertex normals equal
    np.testing.assert_array_equal(pool.normals[:, 0], pool.normals[:, 1])


def test_stl_span_appends(tmp_path):
    pos = np.zeros((3, 3, 3), np.float32)
    path = tmp_path / "m.stl"
    save_stl(path, pos)
    pool = TrianglePool()
    s1 = load_stl_model(path, pool)
    s2 = load_stl_model(path, pool)
    assert s1 == (0, 3) and s2 == (3, 3)  # shared-pool span semantics


def test_stl_missing_file():
    pool = TrianglePool()
    assert load_stl_model("/nonexistent/x.stl", pool) is None


OBJ_FIXTURE = """\
# comment line
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
v 1.0 1.0 0.0
vn 0.0 0.0 2.0
vn 0.0 1.0 0.0
s off
f 1//1 2//1 3//1
f -3 -2 -1
f 2/9/2 4/9/2 3/9/2
"""


def test_obj_forms_and_negative_indices(tmp_path):
    path = tmp_path / "m.obj"
    path.write_text(OBJ_FIXTURE)
    pool = TrianglePool()
    span = load_obj_model(path, pool)
    assert span == (0, 3)
    # face 1: v//vn with normal 1 -> normalized (0,0,1)
    np.testing.assert_allclose(pool.normals[0, 0], [0, 0, 1])
    np.testing.assert_array_equal(pool.positions[0, 1], [1, 0, 0])
    # face 2: negative indices -3,-2,-1 -> vertices 2,3,4 (0-based 1,2,3),
    # no normals -> flat normal of that triangle
    np.testing.assert_array_equal(pool.positions[1, 0], [1, 0, 0])
    np.testing.assert_array_equal(pool.positions[1, 2], [1, 1, 0])
    n = pool.normals[1, 0]
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)
    # face 3: v/vt/vn form, normal 2
    np.testing.assert_allclose(pool.normals[2, 0], [0, 1, 0])


def test_obj_missing_file():
    pool = TrianglePool()
    assert load_obj_model("/nonexistent/x.obj", pool) is None


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(0).integers(0, 256, (12, 17, 3)).astype(np.uint8)
    p = tmp_path / "out.ppm"
    save_ppm(p, img)
    back = load_ppm(p)
    np.testing.assert_array_equal(back, img)


def test_ppm_roundtrip_whitespace_pixels(tmp_path):
    """First pixel bytes that are ASCII whitespace (0x09/0x0A/0x20) must
    survive: the header parse reads exactly one byte after maxval."""
    img = np.full((4, 5, 3), 10, np.uint8)   # 0x0A = '\n'
    img[0, 0] = (32, 9, 13)                  # space, tab, CR
    p = tmp_path / "ws.ppm"
    save_ppm(p, img)
    np.testing.assert_array_equal(load_ppm(p), img)


def test_ppm_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ppm"
    p.write_bytes(b"P5 2 2 255\n\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        load_ppm(p)
    p.write_bytes(b"P6 4 4 255\n\x00\x00")  # truncated
    with pytest.raises(ValueError):
        load_ppm(p)


def test_cli_rejects_zero_time_seed():
    from simple_raytracer_tpu.cli import build_parser
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--config", "1", "--time-seed", "0"])
    args = build_parser().parse_args(["--config", "1", "--time-seed", "7"])
    assert args.time_seed == 7


def test_scene_json_roundtrip(tmp_path):
    sc = Scene()
    m = sc.add_material(Material(color=(0.2, 0.3, 0.4), smoothness=0.5,
                                 transmittance=1.0, refraction_index=1.5),
                        "Glassy")
    sc.add_sphere((1, 2, 3), 0.75, material=m)
    sc.add_plane((0, -1, 0), (0, 1, 0))
    sc.add_box((0, 0, -3), size=(1, 2, 3), material=m)
    sc.sky_reachable = False
    cam = Camera(position=(1, 2, 3), yaw=0.1, pitch=-0.2)
    path = tmp_path / "scene.json"
    save_scene(path, sc, cam)
    sc2, cam2 = load_scene(path)
    assert sc2.sky_reachable is False

    assert len(sc2.spheres) == 1 and len(sc2.planes) == 1
    assert len(sc2.models) == 1
    assert sc2.materials.names == sc.materials.names
    assert sc2.materials[m].refraction_index == 1.5
    np.testing.assert_allclose(sc2.models[0].transform, sc.models[0].transform)
    np.testing.assert_array_equal(sc2.pool.positions, sc.pool.positions)
    assert cam2.position == (1, 2, 3) and cam2.yaw == 0.1

    # built device scenes must be identical
    d1, d2 = sc.build(), sc2.build()
    np.testing.assert_array_equal(np.asarray(d1.triangles.v0.x),
                                  np.asarray(d2.triangles.v0.x))
    np.testing.assert_array_equal(np.asarray(d1.spheres.radius),
                                  np.asarray(d2.spheres.radius))


def test_material_remove_reindex():
    sc = Scene()
    a = sc.add_material(Material(), "A")  # 1
    b = sc.add_material(Material(), "B")  # 2
    s1 = sc.add_sphere((0, 0, 0), 1, material=a)
    s2 = sc.add_sphere((0, 0, 0), 1, material=b)
    sc.materials.remove(a, sc.all_shapes)
    assert s1.material == 0  # deleted -> fall back to 0 (interface.cpp:414)
    assert s2.material == 1  # shifted down
    assert sc.materials.names == ["Material0", "B"]


def test_obj_malformed_lines(tmp_path):
    """Garbage statements are skipped like the reference's mode switch
    (unknown modes fall through, parser.cpp:121-123)."""
    p = tmp_path / "weird.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
vt 0.5 0.5
usemtl whatever
mtllib none.mtl
o object_name
g group
# comment
s 1
f 1 2 3
""")
    pool = TrianglePool()
    span = load_obj_model(p, pool)
    assert span == (0, 1)
    np.testing.assert_array_equal(pool.positions[0, 1], [1, 0, 0])


def test_obj_quad_fan_triangulated(tmp_path):
    """A quad face becomes two triangles (0,1,2)+(0,2,3) — not a silently
    corrupted triangle with the 4th vertex dropped."""
    p = tmp_path / "quad.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""")
    pool = TrianglePool()
    span = load_obj_model(p, pool)
    assert span == (0, 2)
    np.testing.assert_array_equal(pool.positions[0],
                                  [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    np.testing.assert_array_equal(pool.positions[1],
                                  [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    # both fan triangles share the quad's plane normal
    np.testing.assert_allclose(np.abs(pool.normals[:, 0, 2]), 1.0)


def test_obj_pentagon_fan(tmp_path):
    p = tmp_path / "pent.obj"
    verts = "\n".join(f"v {np.cos(a)} {np.sin(a)} 0"
                      for a in np.linspace(0, 2 * np.pi, 5, endpoint=False))
    p.write_text(verts + "\nf 1 2 3 4 5\n")
    pool = TrianglePool()
    assert load_obj_model(p, pool) == (0, 3)


def test_obj_save_roundtrip(tmp_path):
    """save_obj -> load_obj_model reproduces the triangle soup bit-exactly
    (vertices are emitted with %.9g, lossless for float32), including
    smooth per-vertex normals that STL could not round-trip."""
    rng = np.random.default_rng(7)
    pos = rng.standard_normal((11, 3, 3)).astype(np.float32)
    nrm = rng.standard_normal((11, 3, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    p = tmp_path / "soup.obj"
    save_obj(p, pos, nrm)
    pool = TrianglePool()
    assert load_obj_model(p, pool) == (0, 11)
    np.testing.assert_array_equal(pool.positions[:11], pos)
    # loader re-normalizes normals: equal up to one float32 normalize
    np.testing.assert_allclose(pool.normals[:11], nrm, atol=2e-7)
    with pytest.raises(ValueError):
        save_obj(p, pos, nrm[:5])


@pytest.mark.parametrize("bad", [
    "f 1 2\n",                       # face with < 3 vertices
    "v 0 0\n",                       # vertex with < 3 coords
    "v a b c\n",                     # non-numeric coords
    "v 0 0 0\nf 1 2 3\n",            # face index out of range
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1//9 2//9 3//9\n",  # normal OOB
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -7 2 3\n",          # negative OOB
    "vn 0 0 1\nf 1//1 2//1 3//1\n",  # no vertices at all
])
def test_obj_malformed_raises(tmp_path, bad):
    """Fuzz: malformed files fail loudly with a ValueError naming the file,
    never a silent corruption or an uncaught IndexError."""
    p = tmp_path / "bad.obj"
    p.write_text(bad)
    pool = TrianglePool()
    with pytest.raises(ValueError):
        load_obj_model(p, pool)


def test_hdr_roundtrip(tmp_path):
    """save_hdr/load_hdr round-trip: 8-bit mantissa -> <1% relative error
    across a wide dynamic range."""
    from simple_raytracer_tpu.io.image import load_hdr, save_hdr
    rng = np.random.default_rng(11)
    img = (rng.uniform(0.1, 1.0, (7, 16, 3)).astype(np.float32)
           * np.float32(10.0) ** rng.integers(-3, 4, (7, 16, 1)))
    img[0, 0] = 0.0  # black pixel -> E=0 path
    p = tmp_path / "env.hdr"
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape and back.dtype == np.float32
    np.testing.assert_array_equal(back[0, 0], 0.0)
    # RGBE shares one exponent across channels: error bound is relative to
    # the per-pixel max component (8-bit mantissa -> ~0.4%)
    maxc = img.max(axis=-1, keepdims=True)
    rel = np.abs(back - img) / np.maximum(maxc, 1e-9)
    assert rel.max() < 0.005


def test_hdr_rle_runs(tmp_path):
    """Hand-crafted new-style RLE scanline with an actual run (count>128)
    decodes to the repeated value."""
    w, h = 16, 1
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    scan = bytes([2, 2, w >> 8, w & 0xFF])
    scan += bytes([128 + 16, 64])        # R: run of 16 x 64
    scan += bytes([128 + 16, 0])         # G: run of 16 x 0
    scan += bytes([8, *range(8), 8, *range(8)])  # B: two literal chunks
    scan += bytes([128 + 16, 129])       # E: run of 16 x 129 -> scale 2^-7
    p = tmp_path / "rle.hdr"
    p.write_bytes(header + scan)
    from simple_raytracer_tpu.io.image import load_hdr
    img = load_hdr(p)
    np.testing.assert_allclose(img[0, :, 0], 64 * 2.0 ** (129 - 136))
    np.testing.assert_array_equal(img[0, :, 1], 0.0)
    np.testing.assert_allclose(img[0, 3, 2], 3 * 2.0 ** (129 - 136))


def test_hdr_flat_with_old_runs(tmp_path):
    """Flat RGBE stream with an old-style (1,1,1,count) run."""
    w, h = 4, 2   # w<8 -> flat decode path
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    px = bytes([100, 50, 25, 136])       # e=136 -> scale 2^(136-136) = 1
    data = px + bytes([1, 1, 1, 7])      # run: repeat previous 7 times
    p = tmp_path / "flat.hdr"
    p.write_bytes(header + data)
    from simple_raytracer_tpu.io.image import load_hdr
    img = load_hdr(p)
    assert img.shape == (2, 4, 3)
    np.testing.assert_allclose(img.reshape(-1, 3),
                               np.tile([[100.0, 50.0, 25.0]], (8, 1)))


def test_skybox_dispatches_hdr(tmp_path):
    from simple_raytracer_tpu.io.image import load_skybox, save_hdr
    img = np.full((8, 16, 3), 2.5, np.float32)
    img[0, :] = 7.0  # top row in file order
    p = tmp_path / "sky.hdr"
    save_hdr(p, img)
    sky = load_skybox(p)
    # bottom-up: file row 0 (7.0) must land at sky[-1]
    np.testing.assert_allclose(sky[-1], img[0], rtol=0.01)
    np.testing.assert_allclose(sky[0], img[-1], rtol=0.01)


def test_cli_missing_scene_file_is_friendly(capsys):
    from simple_raytracer_tpu.cli import main
    rc = main(["--scene", "/nonexistent/scene.json", "--out", "/tmp/x.png"])
    assert rc == 2
    assert "scene file not found" in capsys.readouterr().err


def test_reference_skybox_asset_decodes():
    """Gated: when the reference checkout is present, its actual skybox PNG
    must decode through our stbi-equivalent loader (C20 parity: float,
    gamma-linearized, vertically flipped)."""
    import os
    path = "/root/reference/assets/skybox.png"
    if not os.path.exists(path):
        pytest.skip("reference asset not available")
    from simple_raytracer_tpu.io.image import load_skybox
    img = load_skybox(path)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.shape[0] >= 64 and img.shape[1] >= 128


def test_hdr_flat_fast_path_and_marker_fallback(tmp_path):
    """A flat (non-RLE) .hdr with no (1,1,1) marker decodes through the
    one-reshape fast path; a stream containing old-style run markers
    still expands correctly through the sequential fallback."""
    import numpy as np
    from simple_raytracer_tpu.io.image import load_hdr, _rgbe_to_float

    # width 4 (< 8) forces the flat writer AND the flat reader
    h, w = 3, 4
    rng = np.random.default_rng(7)
    rgbe = rng.integers(2, 255, (h, w, 4), np.uint8)  # no 1s -> no markers
    p = tmp_path / "flat.hdr"
    p.write_bytes(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
                  + f"-Y {h} +X {w}\n".encode() + rgbe.tobytes())
    np.testing.assert_array_equal(load_hdr(p), _rgbe_to_float(rgbe))

    # old-style run: pixel then (1,1,1,count) repeats it `count` times
    px = np.array([40, 50, 60, 130], np.uint8)
    stream = px.tobytes() + bytes([1, 1, 1, h * w - 1])
    p2 = tmp_path / "runs.hdr"
    p2.write_bytes(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
                   + f"-Y {h} +X {w}\n".encode() + stream)
    img = load_hdr(p2)
    assert img.shape == (h, w, 3)
    assert (img == img.reshape(-1, 3)[0]).all()   # every pixel identical


def test_hdr_corrupt_rle_raises_value_error(tmp_path):
    """Truncated or corrupt new-RLE streams must raise the loader's
    ValueError contract, not IndexError/broadcast errors."""
    import numpy as np
    import pytest
    from simple_raytracer_tpu.io.image import load_hdr

    h, w = 2, 16
    head = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode())
    magic = bytes([2, 2, w >> 8, w & 0xFF])

    # truncated mid-scanline: one literal chunk of 16 promised, 3 given
    p = tmp_path / "trunc.hdr"
    p.write_bytes(head + magic + bytes([16]) + b"\x05\x06\x07")
    with pytest.raises(ValueError, match="truncated"):
        load_hdr(p)

    # zero count never advances: corrupt
    p2 = tmp_path / "zero.hdr"
    p2.write_bytes(head + magic + bytes([0]) + bytes(w * 8))
    with pytest.raises(ValueError, match="count 0"):
        load_hdr(p2)


def test_compare_images_ab_metric(tmp_path):
    """scripts/parity_rmse.py's two-path mode — the docs/AB_PARITY.md
    step-6 comparator run_opencl_ab.sh ends with: u8 RMSE + >1/255
    fraction between a PNG and a PPM, format-agnostic per slot."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from parity_rmse import compare_images

    rng = np.random.default_rng(7)
    a = rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, 0] += 10          # one channel off by 10
    b[3, 4] = b[3, 4] + 1     # one pixel off by exactly 1 (not > 1)

    from PIL import Image
    pa = tmp_path / "a.png"
    Image.fromarray(a).save(pa)
    pb = tmp_path / "b.ppm"
    save_ppm(pb, b)

    r = compare_images(str(pa), str(pb))
    exp_rmse = float(np.sqrt(np.mean((a.astype(np.float64) - b) ** 2)))
    assert abs(r["rmse_u8"] - exp_rmse) < 1e-12
    assert r["pixels_off_by_gt1"] == pytest.approx(1 / 48)
    assert r["res"] == "8x6"

    # size mismatch is a clean error, not a broadcast surprise
    pc = tmp_path / "c.png"
    Image.fromarray(a[:4]).save(pc)
    with pytest.raises(SystemExit, match="size mismatch"):
        compare_images(str(pa), str(pc))
