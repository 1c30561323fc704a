import time
import jax, jax.numpy as jnp, numpy as np
from simple_raytracer_tpu.models.presets import config4_mesh_glass
from simple_raytracer_tpu.ops.pallas.cluster_kernel import intersect_triangles_clustered
from simple_raytracer_tpu.ops.vec import Vec3

R = 2_073_600
scene, camera, _ = config4_mesh_glass()
ds = scene.build()
cl = ds.triangles.clusters
rng = np.random.default_rng(0)

def timeit(name, o, d, alive, iters=10):
    fn = jax.jit(lambda o, d, a: intersect_triangles_clustered(o, d, a, cl.aabb, cl.table))
    out = jax.block_until_ready(fn(o, d, alive))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(o, d, alive)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

mesh_lo = np.asarray(cl.aabb)[:, :3].min(0)
mesh_hi = np.asarray(cl.aabb)[:, 3:6].max(0)

# all rays pointing AWAY from the mesh (zero visits expected)
o = np.full((R, 3), 50.0, np.float32)
d = rng.normal(size=(R, 3)).astype(np.float32)
d = np.abs(d)  # away from the mesh at origin-ish
d /= np.linalg.norm(d, axis=1, keepdims=True)
ov = Vec3.from_array(jnp.asarray(o)); dv = Vec3.from_array(jnp.asarray(d))
ones = jnp.ones((R,), jnp.float32)
timeit("all-miss rays", ov, dv, ones)

# all rays THROUGH the mesh (every block visits both clusters)
o2 = rng.uniform(-1, 1, (R, 3)).astype(np.float32) * 0.2
o2[:, 2] += 2.0
t = np.asarray([0.0, 0.0, -2.5]) - o2
t /= np.linalg.norm(t, axis=1, keepdims=True)
ov2 = Vec3.from_array(jnp.asarray(o2)); dv2 = Vec3.from_array(jnp.asarray(t.astype(np.float32)))
timeit("all-hit rays", ov2, dv2, ones)

# all dead
timeit("all-dead rays", ov2, dv2, jnp.zeros((R,), jnp.float32))
