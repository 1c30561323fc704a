#!/usr/bin/env python
"""Headline benchmark: Mrays/sec/chip at 4-bounce (BASELINE.md target: 100).

Renders the four-sphere materials scene (BASELINE config 2) at 1080p,
1 sample/pixel/pass, 4 bounces, and reports steady-state throughput in
million ray segments per second (W*H*samples*bounces / step time) on the
current default JAX device.  Prints exactly one JSON line.
"""
import json
import sys
import time

import jax


def main():
    from simple_raytracer_tpu.engine import Renderer, RenderOptions
    from simple_raytracer_tpu.models.presets import config2_four_spheres

    width, height, samples, bounces = 1920, 1080, 1, 4
    scene, camera, _ = config2_four_spheres()
    options = RenderOptions(width=width, height=height, num_samples=samples,
                            num_bounces=bounces)
    r = Renderer(options, scene=scene)

    stats = r.benchmark_step(camera, iters=10, warmup=3)
    mrays = stats["mrays_per_second"]
    spp_1080p = stats["spp_per_second"]

    result = {
        "metric": "Mrays/sec/chip (4-bounce, 1080p, four-sphere scene)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
        "extra": {
            "spp_per_second_1080p": round(spp_1080p, 2),
            "seconds_per_step": round(stats["seconds_per_step"], 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
