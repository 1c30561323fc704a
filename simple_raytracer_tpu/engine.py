"""The render engine: progressive accumulation state machine.

This is the TPU-native counterpart of ``class Tracer`` (src/tracer.cpp,
include/tracer.hpp): it owns the jitted render step (compiled once per
static shape configuration — the analog of the one-time OpenCL program
build, tracer.cpp:21-26), the device-resident scene pytree, and the
persistent ``(canvas, num_steps)`` accumulation state that reproduces the
reference's ``time_not_moved`` progressive-rendering contract
(main.cpp:277-348): any scene/camera change resets the canvas, every still
step accumulates one more sample pass, and the displayed image is the
tonemapped mean of all passes since the last change.
"""
from __future__ import annotations

import dataclasses
import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.camera import Camera
from .models.scene import Scene
from .ops.tonemap import tonemap_u8
from .ops.trace import make_render_step


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static render configuration (the jit cache key).

    Defaults mirror the reference app: 960x540, 2 samples, 10 bounces
    (main.cpp:42-46,116-117)."""
    width: int = 960
    height: int = 540
    num_samples: int = 2
    num_bounces: int = 10
    show_normals: bool = False
    # First-hit AOV render target: None = beauty (the path-traced
    # image), "normals" (same as show_normals=True — the reference's
    # only debug view, interface.cpp:374), "depth" (1/(1+t) grayscale,
    # miss = 0), "albedo" (hit material color).  All single-segment,
    # accumulated and tonemapped through the normal pipeline exactly
    # like the reference tonemaps its normals view (render.cl:525-535).
    aov: object = None
    tri_chunk: int = 256
    tri_backend: str = "auto"  # "auto"|"jnp"|"pallas"|"bvh"|"clustered"
    # screen-tile ray ordering (th, tw) for packet-coherent ray blocks;
    # None = row-major; "auto" tiles 8x64 when the image divides evenly.
    # A pure permutation: output is identical either way.
    ray_tile: object = "auto"
    # render on every local device via shard_map data parallelism over
    # horizontal pixel bands (parallel/shard.py); the height must divide
    # by the device count.  Output is bit-identical to single-device
    # rendering (pixel RNG streams are global, render.cl:496 semantics).
    all_devices: bool = False


def _resolve_ray_tile(ray_tile, rows: int, width: int):
    """'auto' -> (8, 64) screen tiles when the row count (full height, or
    the per-device band under all_devices) and width divide evenly; any
    explicit value passes through.  The single source of the rule — the
    renderer, the sharded renderer and benchmark_step must all agree or
    they'd measure/accumulate in different canvas layouts."""
    if ray_tile == "auto":
        return (8, 64) if rows % 8 == 0 and width % 64 == 0 else None
    return ray_tile


class Renderer:
    """Progressive path tracer with persistent device-side state."""

    def __init__(self, options: RenderOptions = RenderOptions(),
                 scene: Optional[Scene] = None):
        self.options = options
        if options.aov not in (None, "normals", "depth", "albedo"):
            raise ValueError(f"unknown aov {options.aov!r} "
                             "(None | 'normals' | 'depth' | 'albedo')")
        # both toggles funnel into the trace path's single mode selector
        self._aov_mode = options.aov or options.show_normals
        self._mesh = None
        self._canvas_sharding = None
        self._tile = None   # non-None: internal canvas is in tile order
        if options.all_devices and len(jax.devices()) > 1:
            from .parallel.mesh import DP_AXIS, make_mesh
            from .parallel.shard import make_sharded_render_step
            mesh = make_mesh()
            n = mesh.shape[DP_AXIS]
            if options.height % n:
                raise ValueError(
                    f"--all-devices: height {options.height} must divide "
                    f"by the {n} local devices (pick a multiple of {n})")
            band = options.height // n
            ray_tile = _resolve_ray_tile(options.ray_tile, band,
                                         options.width)
            # per-band tile order composes into the global (H, W) untile
            # at image time (band_h % th == 0, so band boundaries align
            # with row-tile boundaries)
            self._tile = ray_tile
            self._step_fn, self._mesh, self._canvas_sharding = \
                make_sharded_render_step(
                    options.width, options.height, options.num_samples,
                    options.num_bounces, mesh=mesh,
                    show_normals=self._aov_mode,
                    tri_chunk=options.tri_chunk,
                    tri_backend=options.tri_backend, ray_tile=ray_tile,
                    canvas_tiled=ray_tile is not None)
        else:
            ray_tile = _resolve_ray_tile(options.ray_tile, options.height,
                                         options.width)
            # internal canvases accumulate in ray-tile order: the untile
            # permutation (~1.4 ms/step at 1080p) runs once per fetched
            # image instead of once per step (tonemap is per-pixel)
            self._tile = ray_tile
            self._step_fn = make_render_step(
                options.width, options.height, options.num_samples,
                options.num_bounces, show_normals=self._aov_mode,
                tri_chunk=options.tri_chunk,
                tri_backend=options.tri_backend, ray_tile=ray_tile,
                canvas_tiled=ray_tile is not None,
            )
        self._device_scene = None
        self._canvas = None
        self.num_steps = 0
        self._time_base = 1  # deterministic unless caller passes wall time
        if scene is not None:
            self.update_scene(scene)
        self.clear_canvas()

    @property
    def num_devices(self) -> int:
        """Devices this renderer spreads each step over."""
        return self._mesh.size if self._mesh is not None else 1

    # -- scene / state management ----------------------------------------
    def update_scene(self, scene: Scene, refit: bool = False) -> None:
        """Re-sync the whole scene to the device (Tracer::update_scene,
        tracer.cpp:70-96: full re-upload on any change).  ``refit=True``
        reuses the scene's cached BVH topology for transform-only edits
        (O(T) refit instead of a SAH rebuild — Scene.build)."""
        self._device_scene = scene.build(refit=refit)

    def set_device_scene(self, device_scene) -> None:
        self._device_scene = device_scene

    @property
    def device_scene(self):
        return self._device_scene

    def clear_canvas(self) -> None:
        """Reset accumulation (Tracer::clear_canvas, tracer.cpp:98-101)."""
        o = self.options
        self._canvas = jnp.zeros((o.height, o.width, 3), jnp.float32)
        if self._canvas_sharding is not None:
            self._canvas = jax.device_put(self._canvas,
                                          self._canvas_sharding)
        self.num_steps = 0

    @property
    def canvas(self) -> jnp.ndarray:
        """Row-major (H, W, 3) radiance sum (untiled view of the internal
        accumulation state)."""
        if self._tile is not None:
            from .ops.camera import untile_image
            return untile_image(self._canvas, self._tile)
        return self._canvas

    # -- rendering --------------------------------------------------------
    def step(self, camera: Camera, time: Optional[int] = None) -> None:
        """One progressive sample pass accumulated into the canvas.

        `time` seeds the per-step RNG streams (render.cl:496 uses the ms
        clock); by default a deterministic counter is used so renders are
        reproducible.  time must be nonzero (time=0 collapses every seed).
        """
        if self._device_scene is None:
            raise RuntimeError("no scene: call update_scene() first")
        if time is None:
            time = self._time_base + self.num_steps
        o = self.options
        cam_state = camera.state(o.width / o.height)
        self._canvas = self._step_fn(self._device_scene, cam_state,
                                     self._canvas, jnp.uint32(time))
        self.num_steps += 1

    def render(self, camera: Camera, num_steps: int = 1,
               reset: bool = False) -> np.ndarray:
        """Accumulate `num_steps` passes and return the tonemapped u8 image."""
        if reset:
            self.clear_canvas()
        for _ in range(num_steps):
            self.step(camera)
        return self.image()

    def image(self) -> np.ndarray:
        """Tonemapped (H, W, 3) u8 RGB of the current accumulation state
        (``__kernel average``, render.cl:525-535).  In a multi-process
        (multi-host) render the bands owned by other processes arrive
        over DCN; every process returns the full image."""
        steps = max(self.num_steps, 1)
        from .parallel.distributed import fetch_canvas

        img = tonemap_u8(self._canvas, steps)
        if self._tile is not None:
            from .ops.camera import untile_image
            img = untile_image(img, self._tile)
        return fetch_canvas(img)

    # -- checkpoint / resume ---------------------------------------------
    def state_dict(self) -> dict:
        """Serializable render state: canvas + step count.  Together with a
        scene file this is a full checkpoint (a capability the reference
        lists as future work, README.md:43)."""
        from .parallel.distributed import fetch_canvas

        return {
            "canvas": fetch_canvas(self.canvas),   # row-major, portable
            "num_steps": self.num_steps,
        }

    def load_state_dict(self, state: dict) -> None:
        canvas = np.asarray(state["canvas"], np.float32)
        o = self.options
        if canvas.shape != (o.height, o.width, 3):
            raise ValueError(
                f"canvas shape {canvas.shape} != {(o.height, o.width, 3)}")
        if self._tile is not None:
            from .ops.camera import tile_image
            canvas = tile_image(canvas, self._tile)
        self._canvas = jnp.asarray(canvas)
        if self._canvas_sharding is not None:
            self._canvas = jax.device_put(self._canvas,
                                          self._canvas_sharding)
        self.num_steps = int(state["num_steps"])

    # -- instrumentation --------------------------------------------------
    def benchmark_step(self, camera: Camera, iters: int = 10,
                       warmup: int = 2) -> dict:
        """Steady-state per-pass timing + derived throughput
        (the frame-time window analog, interface.cpp:486-510).

        Methodology: chain N progressive passes INSIDE one jitted
        device-side fori_loop (per-dispatch latency is paid once), force
        execution with a scalar readback (async dispatch makes plain
        block_until_ready timings unreliable on remote-attached devices),
        and difference two chain lengths so the constant dispatch +
        readback overhead cancels exactly.  Sharded renderers fall back
        to host-side stepping (a shard_map step doesn't nest in a
        fori_loop without resharding its carry)."""
        o = self.options
        if self._mesh is not None:
            return self._benchmark_host_loop(camera, iters, warmup)
        ray_tile = _resolve_ray_tile(o.ray_tile, o.height, o.width)
        from .ops.trace import make_render_step
        fn = make_render_step(o.width, o.height, o.num_samples,
                              o.num_bounces, show_normals=self._aov_mode,
                              tri_chunk=o.tri_chunk,
                              tri_backend=o.tri_backend, ray_tile=ray_tile,
                              jit=False, canvas_tiled=ray_tile is not None)
        scene, cam = self._device_scene, camera.state(o.width / o.height)
        n_lo, n_hi = max(2, warmup), max(2, warmup) + iters

        def make_chain(n):
            @jax.jit
            def chain(scene, cam, canvas, t0):
                def body(i, c):
                    return fn(scene, cam, c, t0 + i.astype(jnp.uint32))
                out = jax.lax.fori_loop(0, n, body, canvas)
                return out[::97, ::97, :].sum()
            return chain

        # one chain object per length: a fresh @jax.jit wrapper per loop
        # iteration would re-trace (and possibly re-compile) the same
        # chain twice for no measurement benefit
        chains = {n: make_chain(n) for n in (n_lo, n_hi)}
        times = {}
        for n in (n_lo, n_hi, n_lo, n_hi):
            chain = chains[n]
            canvas = jnp.zeros((o.height, o.width, 3), jnp.float32)
            float(np.asarray(chain(scene, cam, canvas, jnp.uint32(1))))
            t0 = _time.perf_counter()
            float(np.asarray(chain(scene, cam, canvas, jnp.uint32(1000))))
            times.setdefault(n, []).append(_time.perf_counter() - t0)
        dt = (min(times[n_hi]) - min(times[n_lo])) / (n_hi - n_lo)
        return self._throughput(dt)

    def _benchmark_host_loop(self, camera: Camera, iters: int,
                             warmup: int) -> dict:
        for _ in range(warmup):
            self.step(camera)
        np.asarray(jnp.sum(self._canvas[::97, ::97, :]))
        t0 = _time.perf_counter()
        for _ in range(iters):
            self.step(camera)
        np.asarray(jnp.sum(self._canvas[::97, ::97, :]))
        return self._throughput((_time.perf_counter() - t0) / iters)

    def _throughput(self, dt: float) -> dict:
        o = self.options
        rays = o.width * o.height * o.num_samples * o.num_bounces
        return {
            "seconds_per_step": dt,
            "steps_per_second": 1.0 / dt,
            "mrays_per_second": rays / dt / 1e6,
            "spp_per_second": o.num_samples / dt,
        }
