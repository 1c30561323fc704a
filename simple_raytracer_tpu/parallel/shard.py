"""Sharded render step: shard_map data parallelism over pixel bands.

Each device traces the rays of its own horizontal band of the image; the
scene pytree is replicated (it is small — SURVEY §5), the canvas is sharded
by rows and stays device-resident across progressive steps.  Because every
pixel's RNG stream is a pure function of its global pixel id
(render.cl:496), the sharded render is numerically identical to the single-chip
render (up to compiler fp reassociation), which the multichip tests assert.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.trace import render_pass
from .mesh import DP_AXIS, canvas_sharding, make_mesh

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_render_step(width: int, height: int, num_samples: int,
                             num_bounces: int, mesh=None,
                             show_normals: bool = False,
                             tri_chunk: int = 256,
                             tri_backend: str = "auto",
                             ray_tile=None,
                             donate_canvas: bool = True,
                             canvas_tiled: bool = False):
    """Build the multi-chip progressive step: (scene, camera, canvas, time)
    -> canvas, with canvas sharded (H/n, W, 3) per device.

    Takes the same kernel knobs as the single-chip step (trace.py):
    `tri_backend` selects the triangle intersection path inside every
    device's band, `ray_tile` the packet-coherent ray ordering (must
    divide each band, not the full image).

    Returns (step_fn, mesh, canvas_sharding).  `height` must divide evenly
    by the mesh size (pad the image if needed).
    """
    if mesh is None:
        mesh = make_mesh()
    n = mesh.shape[DP_AXIS]
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    tile_h = height // n
    if ray_tile is not None and (tile_h % ray_tile[0] or
                                 width % ray_tile[1]):
        raise ValueError(f"ray tile {ray_tile} must divide the per-device "
                         f"band {tile_h}x{width}")

    def tile_fn(scene, camera, canvas_tile, time):
        row0 = jax.lax.axis_index(DP_AXIS).astype(jnp.uint32) * jnp.uint32(tile_h)
        return render_pass(
            scene, camera, canvas_tile, time,
            width=width, height=height, num_samples=num_samples,
            num_bounces=num_bounces, show_normals=show_normals,
            tri_chunk=tri_chunk, tri_backend=tri_backend,
            ray_tile=ray_tile, row0=row0, tile_height=tile_h,
            canvas_tiled=canvas_tiled,
        )

    mapped = shard_map(
        tile_fn, mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS, None, None), P()),
        out_specs=P(DP_AXIS, None, None),
        check_vma=False,
    )
    donate = (2,) if donate_canvas else ()
    step = jax.jit(mapped, donate_argnums=donate)
    return step, mesh, canvas_sharding(mesh)


def make_sharded_canvas(mesh, height: int, width: int):
    """Zero-initialized (H, W, 3) canvas laid out across the mesh."""
    return jax.device_put(jnp.zeros((height, width, 3), jnp.float32),
                          canvas_sharding(mesh))
