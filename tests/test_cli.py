"""End-to-end CLI flows (SURVEY C17/C22: headless render driver).

Runs cli.main() IN-PROCESS at tiny shapes so the jit cache (in-memory +
persistent) keeps the cost test-suite-friendly: render to PNG and PPM,
checkpoint with --save-state, resume with --load-state (accumulated
steps must add), and a scene-JSON round trip through --scene.
"""
import json

import numpy as np
import pytest

from simple_raytracer_tpu.cli import main

W, H = 64, 36


def _render(argv):
    rc = main(argv)
    assert rc == 0 or rc is None, f"cli exited {rc}"


def _common(out, extra=()):
    return (["--config", "1", "--width", str(W), "--height", str(H),
             "--samples", "1", "--bounces", "2", "--steps", "2",
             "--out", out] + list(extra))


def test_cli_render_save_resume(tmp_path):
    out1 = str(tmp_path / "a.png")
    state = str(tmp_path / "s.npz")
    _render(_common(out1, ["--save-state", state]))

    from PIL import Image
    img = np.asarray(Image.open(out1))
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    assert img.std() > 0          # not a blank frame

    st = np.load(state)
    assert int(st["num_steps"]) == 2
    assert st["canvas"].shape[-1] == 3

    # resume doubles the accumulated step count and changes the image
    # (more accumulation = less noise), while staying the same scene
    out2 = str(tmp_path / "b.png")
    state2 = str(tmp_path / "s2.npz")
    _render(_common(out2, ["--load-state", state,
                           "--save-state", state2]))
    assert int(np.load(state2)["num_steps"]) == 4
    img2 = np.asarray(Image.open(out2))
    assert img2.shape == img.shape
    assert not np.array_equal(img2, img)


def test_cli_ppm_output(tmp_path):
    out = str(tmp_path / "a.ppm")
    _render(_common(out))
    raw = open(out, "rb").read()
    # single-line header, the reference's fprintf format (parser.cpp:8)
    assert raw.startswith(f"P6 {W} {H} 255\n".encode())
    assert len(raw) == raw.index(b"\n") + 1 + W * H * 3


def test_cli_scene_json_roundtrip(tmp_path):
    """--scene consumes the same JSON save_scene emits; the render of the
    loaded scene at fixed options equals rendering the original."""
    from simple_raytracer_tpu.io.scene_json import save_scene
    from simple_raytracer_tpu.models.presets import CONFIGS

    scene, camera, _ = CONFIGS[1]()
    path = str(tmp_path / "scene.json")
    save_scene(path, scene, camera)
    # sanity: it is JSON with shapes in it
    d = json.load(open(path))
    assert d.get("spheres") or d.get("shapes") or d.get("planes")

    out = str(tmp_path / "from_json.png")
    _render(["--scene", path, "--width", str(W), "--height", str(H),
             "--samples", "1", "--bounces", "2", "--steps", "2",
             "--out", out])

    out_direct = str(tmp_path / "direct.png")
    _render(_common(out_direct))

    from PIL import Image
    a = np.asarray(Image.open(out))
    b = np.asarray(Image.open(out_direct))
    np.testing.assert_array_equal(a, b)


def test_cli_missing_scene_file_is_friendly(capsys):
    rc = main(["--scene", "/nonexistent/scene.json", "--out", "/tmp/x.png"])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_cli_warm_compiles_and_writes_nothing(tmp_path, capsys):
    """--warm (the cache-warmer verb, round-3 VERDICT cold-start item)
    compiles the configured shape into the persistent cache, reports
    what it warmed, and exits WITHOUT rendering or writing the output
    file."""
    out = str(tmp_path / "never.png")
    _render(_common(out, ["--warm"]))
    import os
    assert not os.path.exists(out)
    err = capsys.readouterr().err
    assert f"warmed {W}x{H} s1 b2" in err
    assert "persistent cache:" in err
