import time
import jax, jax.numpy as jnp, functools
from simple_raytracer_tpu.models.presets import config2_four_spheres
from simple_raytracer_tpu.ops.trace import render_pass

W, H, S, NB = 1920, 1080, 1, 4
scene, camera, _ = config2_four_spheres()
ds = scene.build()
cam = camera.state(W / H)
canvas = jnp.zeros((H, W, 3), jnp.float32)

kw = dict(width=W, height=H, num_samples=S, num_bounces=NB, ray_tile=None)

def timeit(name, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

# 1. everything as args (what the engine does, minus donation)
f1 = jax.jit(functools.partial(render_pass, **kw))
timeit("args: scene,cam,canvas,time", f1, ds, cam, canvas, jnp.uint32(1))

# 2. scene closed over, cam/canvas/time args
f2 = jax.jit(lambda cam, c, t: render_pass(ds, cam, c, t, **kw))
timeit("args: cam,canvas,time", f2, cam, canvas, jnp.uint32(1))

# 3. only canvas+time as args
f3 = jax.jit(lambda c, t: render_pass(ds, cam, c, t, **kw))
timeit("args: canvas,time", f3, canvas, jnp.uint32(1))

# 4. like 1 but with canvas donation (exact engine config)
f4 = jax.jit(functools.partial(render_pass, **kw), donate_argnums=(2,))
c = jnp.zeros((H, W, 3), jnp.float32)
out = jax.block_until_ready(f4(ds, cam, c, jnp.uint32(1)))
t0 = time.perf_counter()
for _ in range(8):
    out = f4(ds, cam, out, jnp.uint32(1))
jax.block_until_ready(out)
print(f"{'args+donate (engine)':34s} {(time.perf_counter()-t0)/8*1e3:8.2f} ms", flush=True)
