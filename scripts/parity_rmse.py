"""Converged oracle-vs-TPU RMSE on the three showcase reconstructions.

Both renderers consume IDENTICAL RNG streams (the seed is a pure function
of pixel id, sample and step time, render.cl:496), so the mean canvases
are directly comparable: disagreement measures implementation error, not
Monte-Carlo noise.  The oracle runs in its lane-vectorized form
(oracle.render_vec), which is asserted BIT-IDENTICAL to the scalar
per-pixel oracle by tests/test_oracle_vec.py — that equivalence is what
lets the comparison run at the full 960x540 showcase resolution instead
of the reduced grids rounds 1-2 used.

Writes the RMSE table to stdout (markdown) for PARITY.md.

Usage: python scripts/parity_rmse.py [--steps N] [--quick]
       python scripts/parity_rmse.py ours.png reference.ppm

The two-path form is the docs/AB_PARITY.md step-6 comparator (used by
scripts/run_opencl_ab.sh): RMSE over u8 RGB between any two same-size
PNG/PPM images plus the fraction of pixels off by more than 1/255.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np


def rmse(a, b, mask=None):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    if mask is not None:
        d = d[mask]
    return float(np.sqrt(np.mean(d ** 2)))


def run_scene(name, builder, width, height, steps, samples=2, bounces=10):
    import jax
    import oracle
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.ops.tonemap import tonemap_u8

    scene, camera, _ = builder()
    opts = RenderOptions(width=width, height=height, num_samples=samples,
                         num_bounces=bounces)
    r = Renderer(opts, scene=scene)
    for t in range(1, steps + 1):
        r.step(camera, time=t)
    jax.block_until_ready(r.canvas)
    dev_mean = np.asarray(r.canvas) / steps
    dev_img = np.asarray(tonemap_u8(r.canvas, steps), np.float64)

    acc = np.zeros((height, width, 3), np.float64)
    t0 = time.time()
    for t in range(1, steps + 1):
        acc += oracle.render_vec(scene, camera, width, height, samples,
                                 bounces, t)
        print(f"  {name}: oracle step {t}/{steps} "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
    orc_mean = acc / steps
    orc_img = np.asarray(tonemap_u8(np.float32(acc), steps), np.float64)

    # The reference's RNG can emit u == 0 and its Box-Muller then takes
    # log(0) (render.cl:143-150): a handful of paths per megapixel carry
    # non-finite radiance — in the reference, in this renderer, and in
    # the oracle, at the SAME pixels when the masks agree (the RNG
    # stream is shared).  Report the masks and their agreement, and
    # compute the linear RMSE over mutually-finite pixels.
    dev_bad = ~np.isfinite(dev_mean).all(axis=-1)
    orc_bad = ~np.isfinite(orc_mean).all(axis=-1)
    finite = ~(dev_bad | orc_bad)
    lin = rmse(dev_mean, orc_mean, mask=finite)
    ton = rmse(dev_img, orc_img)
    frac = float(np.mean(np.any(np.abs(dev_img - orc_img) > 1, axis=-1)))
    return {"scene": name, "res": f"{width}x{height}",
            "steps": steps, "rmse_linear": lin, "rmse_u8": ton,
            "pixels_off_by_gt1": frac,
            "nonfinite_dev": int(dev_bad.sum()),
            "nonfinite_oracle": int(orc_bad.sum()),
            "nonfinite_masks_equal": bool((dev_bad == orc_bad).all())}


def _load_u8(path: str) -> np.ndarray:
    """PNG (via PIL) or binary P6 PPM -> (H, W, 3) u8."""
    if path.lower().endswith(".ppm"):
        from simple_raytracer_tpu.io.image import load_ppm
        return np.asarray(load_ppm(path))
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def compare_images(path_a: str, path_b: str) -> dict:
    """docs/AB_PARITY.md step 6: u8 RMSE between two converged renders
    (ours vs the OpenCL reference's screenshot).  Monte-Carlo noise from
    the two independent sample streams sets the floor; structural error
    shows up as RMSE that does not anneal with convergence time."""
    a, b = _load_u8(path_a), _load_u8(path_b)
    if a.shape != b.shape:
        raise SystemExit(f"size mismatch: {a.shape} vs {b.shape}")
    d = a.astype(np.float64) - b.astype(np.float64)
    return {"a": path_a, "b": path_b, "res": f"{a.shape[1]}x{a.shape[0]}",
            "rmse_u8": float(np.sqrt(np.mean(d ** 2))),
            "pixels_off_by_gt1": float(np.mean(
                np.any(np.abs(d) > 1, axis=-1)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="*",
                    help="two image paths (PNG/PPM) for a direct A/B")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run only the jobs for this scene name")
    args = ap.parse_args()
    if args.images:
        if len(args.images) != 2:
            ap.error("expected exactly two image paths")
        import json
        r = compare_images(*args.images)
        print(f"RMSE (u8 RGB): {r['rmse_u8']:.4f}   pixels off by "
              f">1/255: {r['pixels_off_by_gt1']:.2%}   ({r['res']})")
        print(json.dumps(r))
        return

    from simple_raytracer_tpu.models.showcase import (showcase_model,
                                                      showcase_red_green,
                                                      showcase_spheres)

    if args.quick:
        jobs = [("red_green", showcase_red_green, 48, 27, 4)]
    else:
        jobs = [
            # reduced rows kept for round-to-round continuity
            ("red_green", showcase_red_green, 96, 54, args.steps),
            ("spheres", showcase_spheres, 96, 54, args.steps),
            # FULL showcase resolution for all three scenes — the mesh
            # scene became tractable in round 4 when the oracle gained
            # chunk-level AABB gating + live-lane compaction (~15x on
            # this scene: >480 -> 33 s/step at 960x540)
            ("spheres", showcase_spheres, 960, 540, args.steps),
            ("red_green", showcase_red_green, 960, 540,
             max(4, args.steps // 2)),
            ("model", showcase_model, 960, 540, max(4, args.steps // 2)),
        ]

    if args.only:
        jobs = [j for j in jobs if j[0] == args.only]
    rows = []
    for name, builder, w, h, steps in jobs:
        rows.append(run_scene(name, builder, w, h, steps))
        print(rows[-1])

    print("\n| scene | resolution | steps | RMSE (linear radiance) | "
          "RMSE (tonemapped u8) | pixels off by >1/255 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scene']} | {r['res']} | {r['steps']} | "
              f"{r['rmse_linear']:.3e} | {r['rmse_u8']:.4f} | "
              f"{r['pixels_off_by_gt1']:.2%} |")


if __name__ == "__main__":
    main()
