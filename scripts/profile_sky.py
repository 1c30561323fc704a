"""Break down config 3's step time: megakernel vs deferred sky pass.

Times on real TPU with the device-chained methodology (dispatch latency
cancels): (a) the full fused step via engine.benchmark_step, (b) the
quad row-gather alone at ray count, (c) gather+decode+mix
(sample_equirect_quad), (d) the whole deferred sky term.
Run: python scripts/profile_sky.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.models.presets import config3_skybox_emissive
from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.ops.sky import sample_equirect_quad, sky_color
from simple_raytracer_tpu.ops.scene_types import SkyboxTex

W, H, S, B = 1920, 1080, 1, 8
N = W * H * S


def timeit(f, *args, n=20):
    """Chained-dependency timing: each result feeds a cheap reduction so
    the device can't overlap across iterations unrealistically; constant
    readback overhead stays in, so use deltas between variants."""
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    scene, camera, _ = config3_skybox_emissive(width=W, height=H)
    r = Renderer(RenderOptions(width=W, height=H, num_samples=S,
                               num_bounces=B), scene=scene)
    ds = r.device_scene
    tex = ds.skybox
    print("skybox type:", type(tex).__name__)

    bench = r.benchmark_step(camera, iters=10)
    print(f"full step (device-chained): "
          f"{bench['seconds_per_step']*1e3:.2f} ms")

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(N, dtype=np.float32))
    v = jnp.asarray(rng.random(N, dtype=np.float32))

    if isinstance(tex, SkyboxTex):
        h, w = tex.shape
        idx = jnp.asarray(rng.integers(0, h * w, N, dtype=np.int64),
                          jnp.int32)
        flat = tex.quad.reshape(h * w, 4)

        g = jax.jit(lambda table, i: jnp.sum(table[i]))
        print(f"row gather (N,4)u32 alone: {timeit(g, flat, idx)*1e3:.2f} ms")

        sq = jax.jit(lambda t, u, v: sample_equirect_quad(t, u, v).x.sum())
        print(f"sample_equirect_quad (gather+decode+mix): "
              f"{timeit(sq, tex, u, v)*1e3:.2f} ms")

    d = np.stack([rng.normal(size=N), rng.normal(size=N),
                  rng.normal(size=N)]).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    from simple_raytracer_tpu.ops.vec import Vec3
    dv = Vec3(*[jnp.asarray(d[i]) for i in range(3)])
    sc = jax.jit(lambda sb, dv: sky_color(dv, ds.sky, sb).x.sum())
    print(f"sky_color full deferred term: "
          f"{timeit(sc, ds.skybox, dv)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
