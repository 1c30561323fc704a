"""Golden-image regression tests for BASELINE configs 1-6.

SURVEY §4: the RNG is a counter-free hash of (pixel id, sample, time), so
fixing time/resolution/samples/bounces makes the whole render a pure
function — goldens are exact on a given platform.  Stored goldens were
rendered on CPU; comparison allows a small RMSE for cross-backend fp
differences while catching any semantic regression.
"""
import os

import numpy as np
import pytest

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
STEPS = 2
TIME0 = 1000

SIZES = {1: (64, 64), 2: (96, 54), 3: (96, 54), 4: (96, 54), 5: (96, 54),
         # config 6 (82K-tri sculpt): kept small — on CPU it renders
         # through the dense jnp path (so this golden IS the
         # tri_backend='jnp' cross-check), on TPU through the
         # production BVH/compact path against the same file
         6: (64, 36)}
# goldens must not depend on the environment: config 3's "auto" skybox
# would load /root/reference's texture whenever that checkout exists, so
# the golden build pins the gradient sky explicitly
KWARGS = {3: {"skybox": "gradient"}}


def render_config(n):
    w, h = SIZES[n]
    scene, camera, options = CONFIGS[n](width=w, height=h,
                                        **KWARGS.get(n, {}))
    options = RenderOptions(width=w, height=h,
                            num_samples=options.num_samples,
                            num_bounces=options.num_bounces)
    r = Renderer(options, scene=scene)
    for i in range(STEPS):
        r.step(camera, time=TIME0 + i)
    return np.asarray(r.canvas, np.float32)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6])
def test_golden(n):
    path = os.path.join(GOLDEN_DIR, f"config{n}.npz")
    canvas = render_config(n)
    assert np.isfinite(canvas).all(), f"config {n} produced non-finite values"
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, canvas=canvas)
        pytest.skip(f"golden for config {n} created — rerun to compare")
    golden = np.load(path)["canvas"]
    assert golden.shape == canvas.shape
    rmse = float(np.sqrt(np.mean((canvas - golden) ** 2)))
    # exact on the same platform; tolerance covers cross-backend fp drift
    assert rmse < 2e-3, f"config {n} RMSE {rmse}"
