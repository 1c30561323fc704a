"""Estimate per-block cluster visit fractions for config4 camera rays."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from simple_raytracer_tpu.models.presets import config4_mesh_glass
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays

W, H, S = 1920, 1080, 1
scene, camera, _ = config4_mesh_glass()
ds = scene.build()
cl = ds.triangles.clusters
aabb = np.asarray(cl.aabb)
C = aabb.shape[0]
cam = camera.state(W / H)
rot = camera_rotation(cam.yaw, cam.pitch)
o, d, _ = generate_rays(W, H, S, jnp.uint32(1), cam.position, rot,
                        cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
BR = 512
nb = o.shape[0] // BR
o = o[:nb*BR].reshape(nb, BR, 3)
d = d[:nb*BR].reshape(nb, BR, 3)
inv = 1.0 / d
visits = np.zeros(C)
for c in range(C):
    lo, hi = aabb[c, :3], aabb[c, 3:6]
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    near = np.maximum(np.minimum(t1, t2).max(-1), 0.0)
    far = np.maximum(t1, t2).min(-1)
    hit = ~(near >= far)           # (nb, BR)
    visits[c] = hit.any(axis=1).mean()
print(f"C={C} clusters; per-cluster fraction of blocks visiting (bounce 0):")
print(np.round(visits, 3))
print("mean visits per block:", round(visits.sum(), 2), "of", C)
