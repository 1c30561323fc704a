"""Independent-stream converged A/B: prove the device estimator is
UNBIASED against the oracle, not merely decorrelated from it.

Matched-stream RMSE (scripts/parity_rmse.py) compares the two
implementations on IDENTICAL RNG streams — powerful for catching
implementation drift, but once any f32-ordering difference flips a
Bernoulli decision the paths decorrelate and the residual mixes
"harmless decorrelation" with "possible small bias"; it cannot tell
them apart (round-3 VERDICT).  This script separates them by
construction: the two renderers get DISJOINT time streams (device
steps t=1..N, oracle steps t=N+1..2N — the seed is a pure function of
(pixel, sample, step time), render.cl:496, so disjoint times give
independent streams), and the comparison is the two-sample z-statistic

    z = (mean_dev - mean_orc) / sqrt(var_dev/N + var_orc/N)

per pixel/channel, with the per-step variance measured from the same
run.  Under the null (both estimators unbiased for the same integral)
z is asymptotically standard normal and the IMAGE-MEAN difference
must sit within ~3 of its own standard error; a systematic bias in
either implementation shows up as |image-mean z| growing with sqrt(N)
instead.

Per-pixel |z|>3 fractions are reported for context but are NOT the
pass bar: path-tracer step estimates are heavy-tailed (caustic and
mirror-light paths), so the normal 0.27% tail is only reached
asymptotically; the image-mean statistic pools ~1.5M pixels and IS
normal to high accuracy.

Writes a markdown table for PARITY.md.

Usage: python scripts/bias_ab.py [--steps N] [--scene NAME] [--quick]
  (run on the TPU; the oracle side is CPU numpy and dominates runtime)
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np


def device_moments(scene, camera, opts, t0, steps):
    """Per-pixel (mean, sample variance) of the per-step frame estimates
    over device steps t0+1..t0+steps, via streaming Welford on host."""
    import jax
    from simple_raytracer_tpu.engine import Renderer

    r = Renderer(opts, scene=scene)
    mean = m2 = None
    prev = np.zeros((opts.height, opts.width, 3), np.float64)
    for i in range(1, steps + 1):
        r.step(camera, time=t0 + i)
        acc = np.asarray(jax.block_until_ready(r.canvas), np.float64)
        frame = acc - prev
        prev = acc
        if mean is None:
            mean = frame.copy()
            m2 = np.zeros_like(frame)
        else:
            delta = frame - mean
            mean += delta / i
            m2 += delta * (frame - mean)
    return mean, m2 / (steps - 1)


def oracle_moments(scene, camera, opts, t0, steps, tag=""):
    import oracle
    mean = m2 = None
    t_start = time.time()
    for i in range(1, steps + 1):
        frame = np.asarray(
            oracle.render_vec(scene, camera, opts.width, opts.height,
                              opts.num_samples, opts.num_bounces, t0 + i),
            np.float64)
        if mean is None:
            mean = frame.copy()
            m2 = np.zeros_like(frame)
        else:
            delta = frame - mean
            mean += delta / i
            m2 += delta * (frame - mean)
        print(f"  {tag} oracle step {i}/{steps} "
              f"({time.time()-t_start:.0f}s)", file=sys.stderr, flush=True)
    return mean, m2 / (steps - 1)


def ab_scene(name, builder, steps, width=None, height=None):
    scene, camera, opts = builder()
    if width:
        from simple_raytracer_tpu.engine import RenderOptions
        opts = RenderOptions(width=width, height=height,
                             num_samples=opts.num_samples,
                             num_bounces=opts.num_bounces)
    # disjoint streams: device times 1..N, oracle times N+1..2N
    dev_mean, dev_var = device_moments(scene, camera, opts, 0, steps)
    orc_mean, orc_var = oracle_moments(scene, camera, opts, steps, steps,
                                       tag=name)

    finite = (np.isfinite(dev_mean).all(-1) & np.isfinite(orc_mean).all(-1)
              & np.isfinite(dev_var).all(-1) & np.isfinite(orc_var).all(-1))
    nf = int((~finite).sum())
    f3 = finite[..., None] & np.ones_like(dev_mean, bool)

    diff = dev_mean - orc_mean
    se2 = dev_var / steps + orc_var / steps      # Var of the mean diff
    z = np.where(se2 > 0, diff / np.sqrt(np.maximum(se2, 1e-300)), 0.0)

    # image-mean statistic: pooled over every finite pixel/channel
    n_eff = int(f3.sum())
    mean_diff = float(diff[f3].mean())
    se_mean = float(np.sqrt(se2[f3].sum()) / n_eff)
    z_img = mean_diff / se_mean if se_mean > 0 else 0.0
    frac_z3 = float((np.abs(z[f3]) > 3).mean())
    return {"scene": name, "res": f"{opts.width}x{opts.height}",
            "steps_each": steps, "mean_diff": mean_diff,
            "se_mean": se_mean, "z_image": z_img,
            "frac_pixel_z_gt3": frac_z3, "nonfinite_pixels": nf,
            "mean_level": float(orc_mean[f3].mean())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from simple_raytracer_tpu.models.showcase import SHOWCASES

    jobs = {"red_green": (SHOWCASES["red_green"], {}),
            "spheres": (SHOWCASES["spheres"], {}),
            "model": (lambda: SHOWCASES["model"](), {})}
    if args.scene:
        jobs = {args.scene: jobs[args.scene]}
    rows = []
    for name, (builder, kw) in jobs.items():
        if args.quick:
            kw = dict(width=96, height=54)
            steps = min(args.steps, 16)
        else:
            steps = args.steps
        rows.append(ab_scene(name, builder, steps, **kw))
        print(json.dumps(rows[-1]), flush=True)

    print("\n| scene | res | steps each | mean diff | SE | z (image) |"
          " pixel \\|z\\|>3 | non-finite px |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scene']} | {r['res']} | {r['steps_each']} |"
              f" {r['mean_diff']:+.2e} | {r['se_mean']:.2e} |"
              f" **{r['z_image']:+.2f}** | {r['frac_pixel_z_gt3']*100:.2f}% |"
              f" {r['nonfinite_pixels']} |")


if __name__ == "__main__":
    main()
