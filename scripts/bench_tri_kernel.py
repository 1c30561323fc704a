import sys, time
import jax, jax.numpy as jnp, numpy as np
from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.ops.intersect import intersect_triangles
from simple_raytracer_tpu.ops.pallas.triangle_kernel import (
    intersect_triangles_pallas, pack_triangles)
from simple_raytracer_tpu.ops.vec import Vec3

R = 2_073_600
sub = int(sys.argv[1]) if len(sys.argv) > 1 else 3
pos, nrm = icosphere(subdivisions=sub)
sc = Scene(); span = sc.pool.append(pos, nrm); sc.add_model(span)
ds = sc.build()
T = ds.triangles.v0.x.shape[0]
rng = np.random.default_rng(0)
o = Vec3.from_array(jnp.asarray(rng.uniform(-3, 3, (R, 3)).astype(np.float32)))
dv = rng.normal(size=(R, 3)).astype(np.float32)
dv /= np.linalg.norm(dv, axis=1, keepdims=True)
d = Vec3.from_array(jnp.asarray(dv))

def timeit(name, fn, iters=5):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gtests = R * T / dt / 1e9
    print(f"{name:24s} {dt*1e3:8.2f} ms  ({gtests:.1f} Gtests/s)")
    return out

print(f"T={T} R={R}")
tbl = pack_triangles(ds.triangles)
jnp_fn = jax.jit(lambda: intersect_triangles(o, d, ds.triangles, chunk=256))
pl_fn = jax.jit(lambda: intersect_triangles_pallas(o, d, tbl))
t1, i1 = timeit("jnp chunk=256", jnp_fn)
t2, i2 = timeit("pallas 256x512", pl_fn)
for br, bt in [(512, 512), (256, 1024), (1024, 512), (128, 512)]:
    try:
        timeit(f"pallas {br}x{bt}", jax.jit(lambda br=br, bt=bt: intersect_triangles_pallas(o, d, tbl, block_r=br, block_t=bt)))
    except Exception as e:
        print(f"pallas {br}x{bt} FAILED: {type(e).__name__}")
t1, t2 = np.asarray(t1), np.asarray(t2)
hit = np.isfinite(t1)
print("hit agree:", (hit == np.isfinite(t2)).all(),
      "t close:", np.allclose(t2[hit], t1[hit], rtol=1e-5),
      "idx agree:", (np.asarray(i1)[hit] == np.asarray(i2)[hit]).mean())
