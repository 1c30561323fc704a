#!/usr/bin/env python
"""Headline benchmark: Mrays/sec/chip at 4-bounce (BASELINE.md target: 100).

Measures ALL FIVE BASELINE configs at 1080p, 1 sample/pixel/pass,
4 bounces, and reports steady-state throughput in million ray segments
per second (W*H*samples*bounces / step time) on the current default JAX
device.  The headline metric stays config 2 (four-sphere materials) for
round-to-round continuity; the per-config numbers live in "extra" so the
weak axis (mesh scenes, configs 4/5) is captured too.  Prints exactly one
JSON line.
"""
import json
import signal
import subprocess
import sys
import time


def _device_probe(timeout_s: float = 300.0) -> str:
    """`import jax` can HANG here before any user code runs: the axon
    sitecustomize claims the TPU pool at interpreter start, and a dead
    relay blocks the claim forever (observed 2026-08-17: a killed remote
    compile wedged the pool for hours).  Probe in a subprocess with a
    hard timeout so the bench prints an honest failure line instead of
    silence."""
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if p.returncode == 0:
            return p.stdout.strip().splitlines()[-1]
        return f"error: rc={p.returncode} {p.stderr[-200:]}"
    except subprocess.TimeoutExpired:
        return "timeout"


_platform = _device_probe()
if _platform in ("timeout",) or _platform.startswith("error"):
    print(json.dumps({
        "metric": "Mrays/sec/chip (4-bounce, 1080p, four-sphere scene)",
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        "extra": {"error": f"device unavailable: {_platform}"}}))
    sys.exit(0)

import jax  # noqa: E402


def bench_config(n: int, width=1920, height=1080, samples=1, bounces=4,
                 iters=10, warmup=3) -> dict:
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


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


def main():
    # headline config first, each config under its own wall-clock bound:
    # a single pathological compile or a wedged device must degrade one
    # entry, not turn the whole bench into silence
    signal.signal(signal.SIGALRM, _alarm)
    per_config = {}
    for n in (2, 1, 3, 4, 5, 6):
        signal.alarm(1500)
        try:
            per_config[f"config{n}"] = bench_config(n)
        except _Timeout:
            per_config[f"config{n}"] = {
                "mrays_per_second": 0.0, "seconds_per_step": None,
                "vs_baseline": 0.0, "error": "timeout (1500s)"}
        finally:
            signal.alarm(0)

    headline = per_config["config2"]
    mrays = headline["mrays_per_second"]
    spp_1080p = mrays * 1e6 / (1920 * 1080 * 4)

    result = {
        "metric": "Mrays/sec/chip (4-bounce, 1080p, four-sphere scene)",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
        "extra": {
            "spp_per_second_1080p": round(spp_1080p, 2),
            "seconds_per_step": headline["seconds_per_step"],
            "device": str(jax.devices()[0]),
            "configs_1080p_1spp_4bounce": per_config,
            "min_config_mrays": min(c["mrays_per_second"]
                                    for c in per_config.values()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
