#!/usr/bin/env python
"""Headline benchmark: Mrays/sec/chip at 4-bounce (BASELINE.md target: 100).

Measures ALL SEVEN configs (the five BASELINE scenes, the 82K-triangle
large-mesh scene, and the 1.31M-triangle mega-mesh stress scene) at
1080p, 1 sample/pixel/pass, 4 bounces, and reports steady-state
throughput in million ray segments per second (W*H*samples*bounces /
step time) on the current default JAX device.  The headline `value` is
the MINIMUM across the six bar-relevant configs (BASELINE asks every
showcase-scale scene to clear 100), not the flattering one; the
beyond-baseline config 7 reports separately in "extra" alongside the
flagship config-2 number and the full per-config map.  Prints exactly
one JSON line.

Every measurement runs in its OWN subprocess with a hard wall-clock
bound: `import jax` can hang before any user code runs (the axon
sitecustomize claims the TPU pool at interpreter start, and a wedged
pool blocks the claim forever — observed 2026-08-17), and a SIGALRM
in-process cannot interrupt a hang inside a C-level XLA compile or
device call.  A subprocess + kill is the only bound that actually
holds; the persistent compilation cache keeps the per-process compile
cost to the first run only.
"""
import json
import subprocess
import sys

CONFIG_TIMEOUT_S = 1500.0


def bench_config(n: int, width=1920, height=1080, samples=1, bounces=4,
                 iters=10, warmup=3) -> dict:
    """Measure one config IN-PROCESS (child-mode entry; also importable
    by scripts/gen_perf_table.py, which runs all configs in one process
    so the README table is definitionally same-run-class as the bench)."""
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import CONFIGS

    scene, camera, _ = CONFIGS[n]()
    options = RenderOptions(width=width, height=height, num_samples=samples,
                            num_bounces=bounces)
    r = Renderer(options, scene=scene)
    stats = r.benchmark_step(camera, iters=iters, warmup=warmup)
    return {
        "mrays_per_second": round(stats["mrays_per_second"], 2),
        "seconds_per_step": round(stats["seconds_per_step"], 5),
        "vs_baseline": round(stats["mrays_per_second"] / 100.0, 3),
    }


def _err(msg: str) -> dict:
    return {"mrays_per_second": 0.0, "seconds_per_step": None,
            "vs_baseline": 0.0, "error": msg}


def _bench_config_subprocess(n: int) -> dict:
    try:
        p = subprocess.run(
            [sys.executable, __file__, "--config", str(n)],
            capture_output=True, text=True, timeout=CONFIG_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return _err(f"timeout ({CONFIG_TIMEOUT_S:.0f}s)")
    if p.returncode != 0:
        return _err(f"rc={p.returncode} {p.stderr[-300:]}")
    try:
        return json.loads(p.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return _err(f"unparseable output: {p.stdout[-300:]}")


def _device_string() -> str:
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=300.0)
        if p.returncode == 0:
            return p.stdout.strip().splitlines()[-1]
        return f"error: rc={p.returncode} {p.stderr[-200:]}"
    except subprocess.TimeoutExpired:
        return "timeout"


def main():
    if "--config" in sys.argv:
        n = int(sys.argv[sys.argv.index("--config") + 1])
        print(json.dumps(bench_config(n)))
        return 0

    device = _device_string()
    if device in ("timeout",) or device.startswith("error"):
        print(json.dumps({
            "metric": "min Mrays/sec/chip over BASELINE configs 1-6 (4-bounce, 1080p)",
            "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
            "extra": {"error": f"device unavailable: {device}"}}))
        return 0

    # headline config first: if the device wedges mid-bench, the most
    # important number is already in hand and the rest degrade per-config
    per_config = {}
    for n in (2, 1, 3, 4, 5, 6, 7):
        per_config[f"config{n}"] = _bench_config_subprocess(n)
    # config 7 (1.31M-tri mega-mesh, HBM streaming path) is a
    # beyond-baseline stress row added round 4: reported in extra, NOT
    # folded into the bar-relevant min (the >=100 bar is BASELINE's
    # showcase-scale scenes; the reference's own architecture cannot
    # render this scene at any usable rate)
    mega = per_config.pop("config7")

    flagship = per_config["config2"]
    min_name, min_cfg = min(per_config.items(),
                            key=lambda kv: kv[1]["mrays_per_second"])
    mrays = min_cfg["mrays_per_second"]
    spp_1080p = flagship["mrays_per_second"] * 1e6 / (1920 * 1080 * 4)

    result = {
        "metric": "min Mrays/sec/chip over BASELINE configs 1-6 (4-bounce, 1080p)",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
        "extra": {
            "min_config": min_name,
            "flagship_config2_mrays": flagship["mrays_per_second"],
            "spp_per_second_1080p": round(spp_1080p, 2),
            "seconds_per_step": flagship["seconds_per_step"],
            "device": device,
            "config7_megamesh_1.31Mtri_mrays": mega["mrays_per_second"],
            "configs_1080p_1spp_4bounce": {**per_config,
                                           "config7": mega},
            # config 6 (82K-triangle mesh) joined the bench in round 3 —
            # earlier BENCH_r*.json min_config covered configs 1-5 only
            "min_config_mrays_r2_set": min(
                per_config[f"config{n}"]["mrays_per_second"]
                for n in (1, 2, 3, 4, 5)),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
