"""Compiled-on-TPU Plücker/MXU parity check (round-4 VERDICT item 6).

`tests/test_bvh_kernel.py:test_plucker_matches_dense` pins the MXU
bilinear Möller–Trumbore form (SRT_BVH_MT=plucker) against the dense
reference — but the suite runs interpret-mode on the CPU mesh, so the
MXU-specific numeric claims (t within f32-reassociation rounding under
the six-pass bf16 decomposition of an f32 HIGHEST matmul) were never
exercised COMPILED on real hardware.  This script runs the same
assertions with interpret=False on the default device, for both table
layouts and both cluster sizes, and asserts the plucker form actually
traced (a silent fallback to the VPU broadcast form would pass every
numeric check).

Battery stage: scripts/tpu_battery.sh runs this after the bench.
Exit 0 and a final "PLUCKER-COMPILED-PARITY PASS" line on success.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.models import Scene
from simple_raytracer_tpu.models.meshgen import icosphere
from simple_raytracer_tpu.ops.intersect import intersect_triangles
from simple_raytracer_tpu.ops.pallas import bvh_kernel as bk
from simple_raytracer_tpu.ops.pallas.bvh_kernel import (
    _N_ATTRS, intersect_triangles_bvh)
from simple_raytracer_tpu.ops.vec import Vec3


def _mesh_scene(cluster_size):
    pos, nrm = icosphere(subdivisions=2)  # 320 tris
    sc = Scene()
    sc.cluster_threshold = 64
    sc.cluster_size = cluster_size
    sc.add_model(sc.pool.append(pos, nrm))
    return sc.build()


def _rays(n, seed=33):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.from_array(jnp.asarray(o)), Vec3.from_array(jnp.asarray(d)))


def check(variant, cluster_size, with_attrs):
    ds = _mesh_scene(cluster_size)
    cl = ds.triangles.clusters
    assert cl.table_tr is not None
    o, d = _rays(700)
    alive = jnp.ones_like(o.x)
    t_init = jnp.where(o.x > 0, 2.0, jnp.inf).astype(jnp.float32)
    t_ref = np.asarray(intersect_triangles(o, d, ds.triangles, chunk=4096)[0])
    i_ref = np.asarray(intersect_triangles(o, d, ds.triangles, chunk=4096)[1])

    os.environ["SRT_BVH_MT"] = "plucker"
    intersect_triangles_bvh.clear_cache()
    traces_before = bk._PLUCKER_TRACES
    try:
        assert bk._mt_form() == "plucker"
        kw = dict(packed_vmem=True) if variant == "packed_vmem" \
            else dict(hbm_table=True)
        res = intersect_triangles_bvh(
            o, d, alive, t_init, cl.aabb, cl.table_t, block_r=128,
            interpret=False, with_attrs=with_attrs, table_tr=cl.table_tr,
            **kw)
        res = jax.block_until_ready(res)
    finally:
        del os.environ["SRT_BVH_MT"]
        intersect_triangles_bvh.clear_cache()
    # traced-path assertion: a silent VPU fallback must fail here
    assert bk._PLUCKER_TRACES > traces_before, \
        f"plucker did not trace ({variant}, K={cluster_size})"

    wins = np.isfinite(t_ref) & (t_ref < np.asarray(t_init))
    assert wins.any()
    np.testing.assert_array_equal(wins, np.asarray(res[1]) >= 0)
    np.testing.assert_allclose(np.asarray(res[0])[wins], t_ref[wins],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(res[1])[wins], i_ref[wins])
    if with_attrs:
        table = np.asarray(cl.table_t)
        gidx = table[:, 20].astype(np.int64)
        row_of = {g: r for r, g in enumerate(gidx) if table[r, 19] > 0}
        i_k = np.asarray(res[1])
        for r in np.flatnonzero(wins)[:32]:
            np.testing.assert_array_equal(
                np.asarray(res[2])[:, r], table[row_of[i_k[r]], :_N_ATTRS])
    print(f"  ok variant={variant} K={cluster_size} "
          f"with_attrs={with_attrs} wins={int(wins.sum())}", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} (compiled, interpret=False)", flush=True)
    for variant in ("packed_vmem", "hbm_packed"):
        for cluster_size in (128, 256):
            check(variant, cluster_size, with_attrs=False)
        check(variant, 128, with_attrs=True)
    print("PLUCKER-COMPILED-PARITY PASS", flush=True)


if __name__ == "__main__":
    main()
