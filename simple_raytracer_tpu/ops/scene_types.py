"""Device-resident scene representation: padded SoA pytrees.

The reference uploads AoS tagged-union ``Shape`` structs byte-for-byte
(src/tracer.cpp:70-96, include/shape.hpp:78-111).  TPU-native layout is the
opposite: one dense, padded structure-of-arrays per primitive type, so the
intersection layer is branch-free ("intersect ALL spheres / planes /
triangles, argmin the t's" — SURVEY C3).  ``active`` masks mark padding
slots, the moral equivalent of the reference's grow-only buffer realloc
(tracer.cpp:5-9) without recompiles.

Model/mesh semantics: the reference stores object-space triangles in a shared
pool and transforms them per-ray in the kernel (render.cl:324-331).  Here the
host pre-transforms each model instance's triangles (and normals, rotation
part only) into world space at scene build; the math is identical and runs
once instead of per ray.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .vec import Vec3


@jax.tree_util.register_pytree_node_class
class SkyboxTex:
    """Quad-packed equirect environment texture — the TPU fast path.

    ``quad`` is (H, W, 4) uint32: for anchor texel (y, x) it holds the
    whole 2x2 bilinear footprint [p(y,x), p(y,x+1), p(y+1,x),
    p(y+1,x+1)] (neighbors clamped to the edge), each texel packed per
    ``mode``:

      'rgb8'  r | g<<8 | b<<16 — 8-bit LDR source, linearized at sample
              time as (c/255)^2.2 (stbi_loadf's ldr->hdr conversion, the
              reference's skybox decode: tracer.cpp:42-55)
      'rgbe'  r | g<<8 | b<<16 | e<<24 — Radiance shared-exponent HDR
              (stb__hdr_convert), decoded as mantissa * 2^(e - 136)

    Why: XLA lowers dynamic gathers on TPU to a serial-ish loop whose
    cost scales with the number of fetched rows and bytes, not with the
    table size — four separate f32x3 tap gathers for 2.07M rays cost
    ~46 ms on v5e, while ONE (N, 4)-u32 row gather fetching the same
    four taps costs ~9 ms.  Packing trades 12 integer-decode ops per
    tap (cheap VPU work) for 5x less gather time.  ``mode`` is pytree
    aux data (static), so the decode branch is baked per compile.
    """

    def __init__(self, quad: jnp.ndarray, mode: str):
        self.quad = quad
        self.mode = mode

    @property
    def shape(self):
        return self.quad.shape[:2]

    def tree_flatten(self):
        return (self.quad,), self.mode

    @classmethod
    def tree_unflatten(cls, mode, children):
        return cls(children[0], mode)


@jax.tree_util.register_pytree_node_class
class SceneFlags:
    """Static (compile-time) per-scene hints.  All flags are pytree AUX
    data — they participate in the jit cache key, never trace, and are
    RESULT-NEUTRAL: a wrong value costs performance, not correctness.

    sky_reachable=False declares the scene enclosed (no ray can escape
    to the environment), letting the megakernel drop its per-block
    early-exit liveness check: rays in an enclosed scene only die on the
    final bounce, so the check is pure overhead there (config 1 measured
    642 vs 735 Mrays/s with/without the check in round 2)."""

    def __init__(self, sky_reachable: bool = True):
        self.sky_reachable = bool(sky_reachable)

    def tree_flatten(self):
        return (), self.sky_reachable

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux)

    def __repr__(self):
        return f"SceneFlags(sky_reachable={self.sky_reachable})"


class SpheresSoA(NamedTuple):
    """Mirrors Sphere (render.cl:29-32) across a padded (Ns,) axis."""
    center: Vec3            # (Ns,)
    radius: jnp.ndarray     # (Ns,) f32
    material: jnp.ndarray   # (Ns,) i32
    active: jnp.ndarray     # (Ns,) bool


class PlanesSoA(NamedTuple):
    """Mirrors Plane (render.cl:34-37) across a padded (Np,) axis."""
    position: Vec3
    normal: Vec3
    material: jnp.ndarray
    active: jnp.ndarray


class TrianglesSoA(NamedTuple):
    """World-space triangles (Nt,), flattened over all model instances.

    Vertex positions and smooth-shading normals mirror Triangle/Vertex
    (render.cl:39-53); ``material`` is inherited from the owning Shape.

    ``shade`` packs the per-triangle shading attributes as one (Nt, 20) f32
    row table [v0 v1 v2 n0 n1 n2 | material | pad] so the winner-triangle
    fetch is a single row gather — XLA's row gathers move whole rows per
    index while N separate column gathers cost N element-serial passes on
    TPU (measured ~8 ms vs ~21 ms EACH for 2M rays)."""
    v0: Vec3
    v1: Vec3
    v2: Vec3
    n0: Vec3
    n1: Vec3
    n2: Vec3
    material: jnp.ndarray
    active: jnp.ndarray
    shade: jnp.ndarray
    # Optional packet-culling acceleration (None for small scenes); part of
    # the pytree structure, so its presence is a jit cache key.
    clusters: Optional[TriangleClustersSoA] = None


class TriangleClustersSoA(NamedTuple):
    """Device layout of accel.Clusters for the packet-culling kernel
    (ops/pallas/bvh_kernel.py).

    The triangle SoA arrays are BVH-reordered at scene build so cluster c
    owns the K consecutive table rows [c*K, (c+1)*K); each (32,) row is
    [v0.xyz, e1.xyz, e2.xyz, n0/n1/n2 (9), material, active,
    global_index_f32, pad to 128 lanes] (indices stored as f32 — exact below 2^24
    triangles).  The kernel keeps the table VMEM-resident when it fits
    and DMA-streams visited row tiles from HBM otherwise.

    table_tr is the PACKED transposed copy for the HBM streaming path:
    ceil(K/128) PACKETS of (24, 128) per cluster — (C, P*24, 128) — with
    the same 21 attributes on SUBLANES and 128 triangles on LANES per
    packet, so a per-visit DMA moves 96 B/triangle instead of the row
    layout's 512 (the kernel transposes each packet back on-chip).
    None when K > 128 isn't a multiple of 128 (no packed form — the
    kernel falls back to row-tile streaming).

    sub_aabb is an OPT-IN finer culling level INSIDE each cluster: 8
    equal slot-range sub-boxes of K/8 triangles each (slot ranges are
    contiguous BVH-DFS subtrees, so they stay spatially tight).  When
    enabled (bvh_kernel.maybe_sub_aabb / SRT_BVH_SUBBOX) the
    streaming/packed kernels slab them per gated 128-ray sub-block and
    run Moller-Trumbore only on hit (K/div, 128) sub-tiles.  Disabled
    by default: on v5e at 82K triangles every division measured SLOWER
    than plain per-sub-block MT (48-51 vs 62.3 Mrays/s) — the
    incoherent-bounce cost floor is per-(block, cluster) slab work,
    which the extra gate adds to.  Empty ranges (padding slots) are
    far-point sentinels culled by the slab gates' near >= 1e38 term.
    None when K isn't a multiple of 64 (sub-tile row offsets must
    stay 8-sublane aligned; see the scene build)."""
    aabb: jnp.ndarray      # (C, 8) f32: [min.xyz, max.xyz, pad, pad]
    table_t: jnp.ndarray   # (C*K, 128) f32
    table_tr: Optional[jnp.ndarray] = None   # (C, 24, 128) f32 packed
    sub_aabb: Optional[jnp.ndarray] = None   # (C*8, 8) f32 sub-boxes


class MaterialsSoA(NamedTuple):
    """Mirrors Material (render.cl:17-27) across a padded (K,) axis."""
    smoothness: jnp.ndarray
    metallic: jnp.ndarray
    specular: jnp.ndarray
    emission_strength: jnp.ndarray
    transmittance: jnp.ndarray
    refraction_index: jnp.ndarray
    color: Vec3
    emission: Vec3


class SkyParams(NamedTuple):
    """Mirrors the environment part of SceneData (render.cl:94-105)."""
    sun_focus: jnp.ndarray
    sun_intensity: jnp.ndarray
    sun_color: Vec3          # scalar components
    sun_direction: Vec3      # scalar components, normalized
    horizon_color: Vec3      # survive in SceneData though the gradient path
    zenith_color: Vec3       # is commented out in the ref (render.cl:381-389)
    ground_color: Vec3


class DeviceScene(NamedTuple):
    """Everything the jitted render step needs, as one pytree argument."""
    spheres: SpheresSoA
    planes: PlanesSoA
    triangles: TrianglesSoA
    materials: MaterialsSoA
    sky: SkyParams
    # None -> analytic gradient sky; SkyboxTex -> quad-packed fast path
    # (u8/RGBE sources); Vec3 -> (Hs, Ws) per channel f32 bottom-up for
    # arbitrary float textures that don't pack exactly
    skybox: Optional[Union[Vec3, SkyboxTex]]
    # static compile-time hints (aux-only pytree node, see SceneFlags)
    flags: SceneFlags = SceneFlags()
