"""Per-bounce compaction-admission profile for config 7 (1.31M tris).

The compact wrapper (bvh_kernel.intersect_triangles_bvh_compact) admits
rays against its coarsened _admission_boxes and falls back to the DENSE
kernel whenever more than `cap` rays admit.  compact_cap_auto sizes cap
at 1/20 of the rays from config 6's measured peak (~3.9%); this script
measures what config 7 actually admits per bounce so the cap policy can
be checked at mega-mesh scale (the round-4 profile shows the FIRST
secondary bounce costing ~125 ms of the 240 ms 4-bounce step — the
dense-fallback signature).

Usage: python scripts/measure_admission7.py [config]   (on the TPU)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import CONFIGS
from simple_raytracer_tpu.ops.bsdf import gather_materials, sample_material
from simple_raytracer_tpu.ops.camera import camera_rotation, generate_rays
from simple_raytracer_tpu.ops.intersect import (closest_hit,
                                                intersect_planes,
                                                intersect_spheres)
from simple_raytracer_tpu.ops.pallas.bvh_kernel import (_admission_boxes,
                                                        compact_cap_auto)
from simple_raytracer_tpu.ops.vec import Vec3, where as vwhere

W, H, S, BOUNCES = 1920, 1080, 1, 6


@jax.jit
def admit_count(boxes, o, d, alive, tfar):
    """Rays admitting >= 1 admission box — the EXACT test the compact
    wrapper gates its lax.cond fallback with (slab vs coarsened boxes,
    far bound capped by the caller's t_init)."""
    col = lambda j: boxes[:, j][:, None]
    inx, iny, inz = 1.0 / d.x[None], 1.0 / d.y[None], 1.0 / d.z[None]
    t1x = (col(0) - o.x[None]) * inx
    t2x = (col(3) - o.x[None]) * inx
    t1y = (col(1) - o.y[None]) * iny
    t2y = (col(4) - o.y[None]) * iny
    t1z = (col(2) - o.z[None]) * inz
    t2z = (col(5) - o.z[None]) * inz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.maximum(jnp.minimum(t1z, t2z), 0.0))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                  jnp.maximum(t1y, t2y)),
                      jnp.minimum(jnp.maximum(t1z, t2z), tfar[None]))
    maybe = jnp.logical_not((near > far) | (near >= 1.0e38)) & alive[None]
    return jnp.sum(maybe.any(axis=0), dtype=jnp.int32)


def main():
    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    scene, camera, _ = CONFIGS[cfg]()
    opt = RenderOptions(width=W, height=H, num_samples=S,
                        num_bounces=BOUNCES)
    r = Renderer(opt, scene=scene)
    ds = r._device_scene
    boxes = _admission_boxes(ds.triangles.clusters.aabb)
    n_rays = W * H * S
    cap = compact_cap_auto(n_rays)
    print(f"config {cfg}: clusters={ds.triangles.clusters.aabb.shape[0]} "
          f"admission_boxes={boxes.shape[0]} rays={n_rays:,} "
          f"cap_auto={cap:,}", flush=True)

    cam = camera.state(W / H)
    rot = camera_rotation(cam.yaw, cam.pitch)
    o, d, seed = generate_rays(W, H, S, jnp.uint32(7), cam.position, rot,
                               cam.aspect_ratio, cam.fov_scale, tile=(8, 64))
    alive = jnp.ones((n_rays,), bool)
    mats = ds.materials

    @jax.jit
    def t_seed_fn(o, d):
        """The production far bound: closest_hit seeds the triangle
        slab test with the best sphere/plane t (render.cl:319
        semantics), so clusters behind a known hit don't admit."""
        t = jnp.full((n_rays,), jnp.inf)
        if ds.spheres.radius.shape[0] > 0:
            t = jnp.minimum(t, intersect_spheres(o, d, ds.spheres)[0])
        if ds.planes.material.shape[0] > 0:
            t = jnp.minimum(t, intersect_planes(o, d, ds.planes)[0])
        return t

    for bounce in range(BOUNCES):
        hit = closest_hit(ds, o, d, alive=alive)
        # capped = the EXACT production admission (far bound seeded with
        # min sphere/plane t, as closest_hit does); uncapped (far=inf)
        # is the conservative upper bound kept for comparison
        n_capped = int(admit_count(boxes, o, d, alive, t_seed_fn(o, d)))
        n_admit = int(admit_count(boxes, o, d, alive,
                                  jnp.full((n_rays,), jnp.inf)))
        live = int(jnp.sum(alive))
        if bounce == 0:
            # trace_rays peels bounce 0 dense unconditionally (coherent
            # camera rays lose under compaction) — the cap verdict does
            # not apply
            verdict = "dense by policy (peeled)"
        else:
            verdict = ("DENSE-FALLBACK" if n_capped > cap
                       else "compact ok")
        print(f"bounce {bounce}: live={live:>9,} "
              f"admit(t_init)={n_capped:>9,} ({n_capped / n_rays:6.2%}) "
              f"admit(inf)={n_admit:>9,} ({n_admit / n_rays:6.2%})  "
              f"{verdict}", flush=True)
        # advance rays exactly like trace_rays: sample the BSDF at hits
        m = gather_materials(mats, hit.material)
        ms = sample_material(hit.position, hit.normal, hit.front, d, m, seed)
        alive = alive & hit.hit
        o = vwhere(alive, ms.origin, o)
        d = vwhere(alive, ms.direction, d)
        seed = jnp.where(alive, ms.seed, seed)


if __name__ == "__main__":
    main()
