"""Command-line renderer: scene file or preset config -> PNG/PPM.

The reference has no CLI (argc != 1 is a usage error, main.cpp:53-56) and
configures everything through compile-time defines + ImGui state; here a
dataclass config + argparse CLI is the headless equivalent (SURVEY §5
"config/flag system").
"""
from __future__ import annotations

import argparse
import json
import sys
import time as _time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="srt-render",
        description="TPU-native progressive path tracer")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON file (io.scene_json format)")
    from .models.presets import CONFIGS
    src.add_argument("--config", type=int, choices=sorted(CONFIGS),
                     help="built-in BASELINE config number")
    p.add_argument("--out", default="out.png", help="output image (.png/.ppm)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--samples", type=int, default=None, help="samples/pixel/step")
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--steps", type=int, default=16,
                   help="progressive accumulation steps")
    p.add_argument("--show-normals", action="store_true",
                   help="normals debug render (render.cl:407-410 analog)")
    p.add_argument("--aov", choices=["normals", "depth", "albedo"],
                   default=None,
                   help="first-hit AOV render target instead of the "
                        "path-traced image (depth = 1/(1+t) grayscale, "
                        "albedo = hit material color)")
    p.add_argument("--mesh-path", default=None,
                   help="STL/OBJ file for mesh configs (4/5)")
    p.add_argument("--skybox", default=None, help="equirect skybox image file")
    p.add_argument("--tri-backend",
                   choices=["auto", "jnp", "pallas", "bvh", "clustered"],
                   default="auto", help="triangle intersection backend")
    def _positive_seed(v):
        iv = int(v)
        if iv < 1:
            # time=0 collapses every pixel's RNG stream to seed 0
            # (pixel_seed multiplies by time, render.cl:496)
            raise argparse.ArgumentTypeError("--time-seed must be >= 1")
        return iv

    p.add_argument("--time-seed", type=_positive_seed, default=None,
                   help="RNG time seed, >= 1 (default: deterministic counter)")
    p.add_argument("--all-devices", action="store_true",
                   help="shard the render over every local device "
                        "(horizontal pixel bands; bit-identical output)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host render: initialize jax.distributed "
                        "before device use (combine with --all-devices; "
                        "the mesh then spans every process's chips and "
                        "only process 0 writes files)")
    p.add_argument("--coordinator", default=None,
                   help="--distributed: coordinator host:port (default: "
                        "JAX_COORDINATOR_ADDRESS or pod autodetection)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="--distributed: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="--distributed: this process's rank")
    p.add_argument("--wall-clock-seed", action="store_true",
                   help="seed from the ms clock like the reference app")
    p.add_argument("--save-state", default=None,
                   help="write accumulation checkpoint (.npz)")
    p.add_argument("--load-state", default=None,
                   help="resume accumulation checkpoint (.npz)")
    p.add_argument("--warm", action="store_true",
                   help="compile this invocation's static render shape "
                        "into the persistent compilation cache and exit "
                        "without rendering — run once per machine (or in "
                        "a deploy step) and every later process gets a "
                        "seconds-scale first frame instead of the "
                        "minutes-scale XLA cold compile")
    p.add_argument("--metrics", action="store_true",
                   help="print per-run throughput metrics JSON")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace into this directory")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.distributed:
        # must run before the first device access in this process
        from .parallel import distributed
        distributed.initialize(args.coordinator, args.num_processes,
                               args.process_id)

    import numpy as np

    from .engine import Renderer, RenderOptions
    from .io.image import load_skybox, save_png, save_ppm
    from .models.camera import Camera
    from .utils.metrics import profiler_trace, ray_throughput

    if args.scene:
        import os
        if not os.path.exists(args.scene):
            # friendly error like the editor's "Inexistant file" message
            # (interface.cpp:277-290) instead of a raw traceback
            print(f"srt-render: error: scene file not found: {args.scene}",
                  file=sys.stderr)
            return 2
        from .io.scene_json import load_scene
        scene, camera = load_scene(args.scene)
        if camera is None:
            camera = Camera()
        options = RenderOptions()
    else:
        from .models.presets import CONFIGS
        kwargs = {}
        if args.config in (4, 5, 6) and args.mesh_path:
            kwargs["mesh_path"] = args.mesh_path
        scene, camera, options = CONFIGS[args.config](**kwargs)

    if args.skybox:
        scene.skybox = load_skybox(args.skybox)

    # replace, don't rebuild: preset-supplied fields outside the CLI's
    # flag set (tri_chunk, ray_tile, future options) must carry over
    import dataclasses
    options = dataclasses.replace(
        options,
        width=args.width or options.width,
        height=args.height or options.height,
        num_samples=args.samples or options.num_samples,
        num_bounces=args.bounces or options.num_bounces,
        show_normals=args.show_normals,
        aov=args.aov,
        tri_backend=args.tri_backend,
        all_devices=args.all_devices,
    )
    r = Renderer(options, scene=scene)
    if args.all_devices:
        print(f"srt-render: sharding over {r.num_devices} device(s)",
              file=sys.stderr)

    if args.warm:
        # the cache-warmer verb (the analog of the reference's sub-second
        # clBuildProgram at launch, tracer.cpp:21-26, which a multi-minute
        # XLA megakernel compile cannot match cold): compile the step +
        # image-fetch for THIS flag set, let the persistent cache absorb
        # the artifacts, and exit.  scripts/ttff.py measures the result:
        # warm first-frame ~10 s vs minutes cold.
        import jax as _jax
        t0 = _time.perf_counter()
        r.step(camera, time=1)
        r.image()
        dt = _time.perf_counter() - t0
        print(f"warmed {options.width}x{options.height} "
              f"s{options.num_samples} b{options.num_bounces} in "
              f"{dt:.1f}s (persistent cache: "
              f"{_jax.config.jax_compilation_cache_dir})", file=sys.stderr)
        return 0

    if args.load_state:
        data = np.load(args.load_state)
        r.load_state_dict({"canvas": data["canvas"],
                           "num_steps": int(data["num_steps"])})

    t0 = _time.perf_counter()
    prev_ms = 0
    with profiler_trace(args.profile_dir):
        for i in range(args.steps):
            if args.wall_clock_seed:
                # monotonic guard: steps dispatch asynchronously in well
                # under a millisecond, and identical timestamps would
                # collapse their RNG streams into duplicated samples
                t = max(prev_ms + 1, int(_time.time() * 1000)) & 0xFFFFFFFF
                t = t or 1
                prev_ms = t
            elif args.time_seed is not None:
                # offset by the RESTORED step count so --load-state
                # resumes don't replay the first run's exact seeds
                t = args.time_seed + r.num_steps
            else:
                t = None
            r.step(camera, time=t)
        img = r.image()
    dt = _time.perf_counter() - t0

    write_files = True
    if args.distributed:
        from .parallel.distributed import should_write_output
        write_files = should_write_output()

    if write_files:
        if args.out.lower().endswith((".ppm", ".pnm")):
            save_ppm(args.out, img)
        else:
            save_png(args.out, img)

    if args.save_state:
        # state_dict() fetches the canvas, which is a COLLECTIVE
        # (process_allgather) under --distributed — every process must
        # execute it; only the file write is gated on process 0.
        st = r.state_dict()
        if write_files:
            np.savez_compressed(args.save_state, canvas=st["canvas"],
                                num_steps=st["num_steps"])

    if args.metrics:
        m = ray_throughput(options.width, options.height,
                           options.num_samples * args.steps,
                           options.num_bounces, dt)
        # ray_throughput's seconds_per_step echoes its dt argument, which
        # here is the WHOLE run; report the per-step figure every other
        # producer of that key (benchmark_step, bench.py) reports
        m["seconds_per_step"] = dt / max(args.steps, 1)
        m["total_seconds"] = dt
        m["steps"] = args.steps
        print(json.dumps(m))
    if write_files:
        print(f"wrote {args.out} ({r.num_steps} accumulated steps)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
