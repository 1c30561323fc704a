import time
import jax, jax.numpy as jnp
from simple_raytracer_tpu.models.presets import config2_four_spheres
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.trace import trace_rays, render_pass
from simple_raytracer_tpu.ops import trace as trace_mod
from simple_raytracer_tpu.ops.vec import Vec3, where as vwhere
from simple_raytracer_tpu.ops.intersect import closest_hit
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.sky import sky_color

W, H, S, NB = 1920, 1080, 1, 4
scene, camera, _ = config2_four_spheres()
ds = scene.build()
cam = camera.state(W / H)

def timeit(name, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:26s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

rot = camera_rotation(cam.yaw, cam.pitch)
o, d, seed = jax.jit(lambda: generate_rays(W, H, S, jnp.uint32(1), cam.position, rot, cam.aspect_ratio, cam.fov_scale))()
jax.block_until_ready(o)

timeit("trace_rays scan", jax.jit(lambda o, d, seed: trace_rays(ds, o, d, seed, NB)), o, d, seed)

def trace_unrolled(o, d, seed):
    n = o.x.shape[0]
    zeros = jnp.zeros((n,), jnp.float32); ones = jnp.ones((n,), jnp.float32)
    color = Vec3(zeros, zeros, zeros); mask = Vec3(ones, ones, ones)
    alive = jnp.ones((n,), bool)
    sky_mask = Vec3(zeros, zeros, zeros); sky_dir = Vec3(zeros, zeros, ones)
    for i in range(NB):
        hit = closest_hit(ds, o, d, tri_backend="jnp")
        h_alive = alive & hit.hit
        m_alive = alive & (~hit.hit)
        sky_mask = vwhere(m_alive, mask, sky_mask)
        sky_dir = vwhere(m_alive, d, sky_dir)
        mat = gather_materials(ds.materials, hit.material)
        color = vwhere(h_alive, color + mask * mat.emission * mat.emission_strength, color)
        cont = h_alive & (i < NB - 1)
        ms = sample_material(hit.position, hit.normal, hit.front, d, mat, seed)
        o = vwhere(cont, ms.origin, o); d = vwhere(cont, ms.direction, d)
        mask = vwhere(cont, mask * ms.mask_mul, mask)
        seed = jnp.where(cont, ms.seed, seed)
        alive = cont
    return color + sky_mask * sky_color(sky_dir, ds.sky, ds.skybox)

timeit("trace unrolled", jax.jit(trace_unrolled), o, d, seed)

canvas = jnp.zeros((H, W, 3), jnp.float32)
timeit("render_pass full", jax.jit(lambda c: render_pass(ds, cam, c, jnp.uint32(1), width=W, height=H, num_samples=S, num_bounces=NB, ray_tile=None)), canvas)
