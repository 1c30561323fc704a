"""Combined full-resolution parity + bias A/B for the showcase scenes.

One 200-step oracle run per scene feeds BOTH round-5 deliverables:

  * parity (matched streams): the device renders t = 1..N with the SAME
    RNG stream the oracle consumes (the seed is a pure function of
    (pixel, sample, step time), render.cl:496), so the converged mean
    canvases are directly comparable — RMSE measures implementation
    error, not Monte-Carlo noise (scripts/parity_rmse.py semantics).
  * bias (disjoint streams): a second device run at t = N+1..2N gives
    per-step moments on a stream INDEPENDENT of the oracle's t = 1..N,
    and the two-sample image-mean z-statistic tests the estimators for
    systematic bias (scripts/bias_ab.py semantics — that script gives
    the device t=1..N and the oracle t=N+1..2N; here the assignment is
    swapped so the oracle side can be shared with the parity row; the
    z-statistic is symmetric in the two runs, only disjointness
    matters).

Runs in three phases so the single TPU is held only briefly and the
hours-long single-core oracle side is resumable:

  python scripts/ab_full.py --phase device [--steps N] [--scene S]
  python scripts/ab_full.py --phase oracle --scene S  (checkpoints every
      10 steps to showcase/ab_cache/, safe to kill and relaunch)
  python scripts/ab_full.py --phase report            (markdown tables)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

CACHE = "/root/repo/showcase/ab_cache"
SCENES = ["red_green", "spheres", "model"]


def _builder(name):
    from simple_raytracer_tpu.models.showcase import SHOWCASES
    return SHOWCASES[name]


def device_phase(name, steps):
    """TPU side: matched canvas at t=1..N + bias moments at t=N+1..2N."""
    import jax
    from simple_raytracer_tpu.engine import Renderer

    scene, camera, opts = _builder(name)()
    t0 = time.time()
    r = Renderer(opts, scene=scene)
    for t in range(1, steps + 1):
        r.step(camera, time=t)
    matched_canvas = np.asarray(jax.block_until_ready(r.canvas), np.float32)
    t_matched = time.time() - t0
    print(f"  {name}: matched device run {steps} steps {t_matched:.0f}s",
          flush=True)

    # disjoint-stream run with per-step Welford moments (bias side)
    t0 = time.time()
    r.clear_canvas()
    mean = m2 = None
    prev = np.zeros((opts.height, opts.width, 3), np.float64)
    for i in range(1, steps + 1):
        r.step(camera, time=steps + i)
        acc = np.asarray(jax.block_until_ready(r.canvas), np.float64)
        frame = acc - prev
        prev = acc
        if mean is None:
            mean, m2 = frame.copy(), np.zeros_like(frame)
        else:
            delta = frame - mean
            mean += delta / i
            m2 += delta * (frame - mean)
    t_bias = time.time() - t0
    print(f"  {name}: bias device run {steps} steps {t_bias:.0f}s", flush=True)

    os.makedirs(CACHE, exist_ok=True)
    np.savez_compressed(
        os.path.join(CACHE, f"{name}_dev_{steps}.npz"),
        matched_canvas=matched_canvas, bias_mean=mean,
        bias_var=m2 / (steps - 1), steps=steps,
        t_matched=t_matched, t_bias=t_bias)


def oracle_phase(name, steps, ckpt_every=10):
    """CPU side: Welford moments of the per-step oracle frames, t=1..N.
    Resumable: checkpoints (mean, m2, i) every `ckpt_every` steps."""
    import oracle

    scene, camera, opts = _builder(name)()
    ck = os.path.join(CACHE, f"{name}_orc_{steps}.ckpt.npz")
    out = os.path.join(CACHE, f"{name}_orc_{steps}.npz")
    if os.path.exists(out):
        print(f"  {name}: oracle result exists, skipping", flush=True)
        return
    start, mean, m2 = 1, None, None
    if os.path.exists(ck):
        d = np.load(ck)
        start, mean, m2 = int(d["i"]) + 1, d["mean"].copy(), d["m2"].copy()
        print(f"  {name}: resuming oracle at step {start}", flush=True)
    t0 = time.time()
    for i in range(start, steps + 1):
        frame = np.asarray(
            oracle.render_vec(scene, camera, opts.width, opts.height,
                              opts.num_samples, opts.num_bounces, i),
            np.float64)
        if mean is None:
            mean, m2 = frame.copy(), np.zeros_like(frame)
        else:
            delta = frame - mean
            mean += delta / i
            m2 += delta * (frame - mean)
        print(f"  {name}: oracle step {i}/{steps} ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        if i % ckpt_every == 0 or i == steps:
            np.savez(ck + ".tmp.npz", mean=mean, m2=m2, i=i)
            os.replace(ck + ".tmp.npz", ck)
    np.savez_compressed(out, mean=mean, var=m2 / (steps - 1), steps=steps)
    os.remove(ck)
    print(f"  {name}: oracle done ({time.time()-t0:.0f}s)", flush=True)


def _rmse(a, b, mask=None):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    if mask is not None:
        d = d[mask]
    return float(np.sqrt(np.mean(d ** 2)))


def report_phase(steps, scenes):
    from simple_raytracer_tpu.ops.tonemap import tonemap_u8

    parity_rows, bias_rows = [], []
    for name in scenes:
        dev_p = os.path.join(CACHE, f"{name}_dev_{steps}.npz")
        orc_p = os.path.join(CACHE, f"{name}_orc_{steps}.npz")
        if not (os.path.exists(dev_p) and os.path.exists(orc_p)):
            print(f"  {name}: missing {dev_p if not os.path.exists(dev_p) else orc_p}, skipping")
            continue
        dev, orc = np.load(dev_p), np.load(orc_p)
        n = int(dev["steps"])
        _, _, opts = _builder(name)()
        res = f"{opts.width}x{opts.height}"

        # -- parity (matched streams, t=1..N) --------------------------
        dev_mean = np.asarray(dev["matched_canvas"], np.float64) / n
        orc_mean = np.asarray(orc["mean"], np.float64)
        dev_bad = ~np.isfinite(dev_mean).all(-1)
        orc_bad = ~np.isfinite(orc_mean).all(-1)
        finite = ~(dev_bad | orc_bad)
        dev_img = np.asarray(tonemap_u8(dev["matched_canvas"], n), np.float64)
        orc_img = np.asarray(
            tonemap_u8(np.float32(orc_mean * n), n), np.float64)
        parity_rows.append({
            "scene": name, "res": res, "steps": n,
            "rmse_linear": _rmse(dev_mean, orc_mean, mask=finite),
            "rmse_u8": _rmse(dev_img, orc_img),
            "pixels_off_by_gt1": float(np.mean(
                np.any(np.abs(dev_img - orc_img) > 1, axis=-1))),
            "nonfinite_dev": int(dev_bad.sum()),
            "nonfinite_oracle": int(orc_bad.sum()),
            "nonfinite_masks_equal": bool((dev_bad == orc_bad).all())})

        # -- bias (disjoint streams: dev t=N+1..2N vs orc t=1..N) ------
        dmean, dvar = dev["bias_mean"], dev["bias_var"]
        ovar = orc["var"]
        fin = (np.isfinite(dmean).all(-1) & np.isfinite(orc_mean).all(-1)
               & np.isfinite(dvar).all(-1) & np.isfinite(ovar).all(-1))
        f3 = fin[..., None] & np.ones_like(dmean, bool)
        diff = dmean - orc_mean
        se2 = dvar / n + ovar / n
        z = np.where(se2 > 0, diff / np.sqrt(np.maximum(se2, 1e-300)), 0.0)
        n_eff = int(f3.sum())
        mean_diff = float(diff[f3].mean())
        se_mean = float(np.sqrt(se2[f3].sum()) / n_eff)
        bias_rows.append({
            "scene": name, "res": res, "steps_each": n,
            "mean_diff": mean_diff, "se_mean": se_mean,
            "z_image": mean_diff / se_mean if se_mean > 0 else 0.0,
            "frac_pixel_z_gt3": float((np.abs(z[f3]) > 3).mean()),
            "nonfinite_pixels": int((~fin).sum()),
            "mean_level": float(orc_mean[f3].mean())})

    print("\n## parity (matched streams)")
    print("| scene | resolution | steps | RMSE (linear radiance) | "
          "RMSE (tonemapped u8) | pixels off by >1/255 | nf masks equal |")
    print("|---|---|---|---|---|---|---|")
    for r in parity_rows:
        print(f"| {r['scene']} | {r['res']} | {r['steps']} | "
              f"{r['rmse_linear']:.3e} | {r['rmse_u8']:.4f} | "
              f"{r['pixels_off_by_gt1']:.2%} | "
              f"{r['nonfinite_masks_equal']} |")
    print("\n## bias (independent streams)")
    print("| scene | res | steps/side | mean diff | SE | z (image) |"
          " pixel \\|z\\|>3 | mean level |")
    print("|---|---|---|---|---|---|---|---|")
    for r in bias_rows:
        print(f"| {r['scene']} | {r['res']} | {r['steps_each']} |"
              f" {r['mean_diff']:+.2e} | {r['se_mean']:.2e} |"
              f" **{r['z_image']:+.2f}** | {r['frac_pixel_z_gt3']*100:.2f}% |"
              f" {r['mean_level']:.3f} |")
    print()
    print(json.dumps({"parity": parity_rows, "bias": bias_rows}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["device", "oracle", "report"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--scene", default=None)
    args = ap.parse_args()
    scenes = [args.scene] if args.scene else SCENES
    if args.phase == "device":
        for s in scenes:
            device_phase(s, args.steps)
    elif args.phase == "oracle":
        for s in scenes:
            oracle_phase(s, args.steps)
    else:
        report_phase(args.steps, scenes)


if __name__ == "__main__":
    main()
