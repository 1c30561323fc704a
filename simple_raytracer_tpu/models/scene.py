"""Editable host scene + compilation to the device SoA pytree.

The host ``Scene`` plays the role of main.cpp's shape/triangle/material
vectors (main.cpp:95-126) plus the SceneData sky block; ``Scene.build()``
plays the role of ``Tracer::update_scene`` (tracer.cpp:70-96) — except that
instead of a raw struct upload it produces a padded, pre-transformed
``DeviceScene`` pytree that is passed as an argument to the jitted render
step.  Padding to bucket capacities keeps jit cache hits across shape
add/remove (the moral equivalent of grow-only realloc, tracer.cpp:5-9).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.scene_types import (DeviceScene, MaterialsSoA, PlanesSoA,
                               SceneFlags, SkyParams, SpheresSoA,
                               TriangleClustersSoA, TrianglesSoA)

from ..ops.vec import Vec3
from .materials import Material, MaterialSet, from_hex
from .shapes import Box, Model, Plane, Sphere, TrianglePool


def _bucket(n: int, minimum: int = 4) -> int:
    """Smallest power of two >= max(n, minimum); 0 stays 0 so that empty
    primitive categories cost nothing (their arrays are zero-capacity and
    the intersection layer skips them statically)."""
    if n == 0:
        return 0
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


@dataclasses.dataclass
class SkySettings:
    """Defaults mirror main.cpp:120-126."""
    sun_focus: float = 25.0
    sun_intensity: float = 1.0
    sun_color: Tuple[float, float, float] = from_hex(0xFFFFD3)
    sun_direction: Tuple[float, float, float] = (
        0.7071067811865475, -0.7071067811865475, 0.0)  # normalize(1,-1,0)
    horizon_color: Tuple[float, float, float] = from_hex(0x374F62)
    zenith_color: Tuple[float, float, float] = from_hex(0x11334A)
    ground_color: Tuple[float, float, float] = from_hex(0x777777)


def _vec3_table(a: np.ndarray) -> Vec3:
    a = np.asarray(a, np.float32).reshape(-1, 3)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def _vec3_scalar(v) -> Vec3:
    return Vec3(jnp.float32(v[0]), jnp.float32(v[1]), jnp.float32(v[2]))


class Scene:
    """Mutable scene: primitive lists + shared triangle pool + materials."""

    # meshes at or above this triangle count get BVH clusters baked for
    # the packet-culling kernel (ops/pallas/bvh_kernel.py); smaller ones
    # stay dense.  One table layout serves both kernel variants — the
    # kernel keeps it VMEM-resident when it fits and streams it from HBM
    # with double-buffered DMA otherwise.
    cluster_threshold: int = 512
    # None = auto cluster size: K=64 for meshes whose row table stays
    # VMEM-resident (measured best for the full 4-bounce step: config5
    # 1080p 63.3 -> 59.2 ms vs K=128; K=32 and K=256 both worse), K=128
    # for larger meshes so the PACKED transposed table fills every tile
    # lane — that keeps ~100K-triangle tables inside the megakernel's
    # VMEM residence budget (bounce_kernel.MEGA_PACKED_MAX_CLUSTERS).
    # Set an int to force a specific K.
    cluster_size: Optional[int] = None

    def __init__(self, default_material: bool = True):
        self.spheres: List[Sphere] = []
        self.planes: List[Plane] = []
        self.models: List[Model] = []
        self.pool = TrianglePool()
        self.materials = MaterialSet()
        self.sky = SkySettings()
        self.skybox: Optional[np.ndarray] = None  # (H, W, 3) f32, bottom-up
        # perf hint: declare the scene enclosed (no ray escapes to the
        # sky) to skip the megakernel's early-exit check — result-neutral
        # either way (ops.scene_types.SceneFlags)
        self.sky_reachable: bool = True
        self._box_span: Optional[Tuple[int, int]] = None
        self._cluster_topo = None   # (key, accel.Clusters) refit cache
        self._auto_k = None         # (topo key, decided auto cluster K)
        self._skybox_dev = None     # (skybox array ref, device rep) cache
        if default_material:
            # default scene has one white diffuse "Material0" (main.cpp:100)
            self.materials.push(Material(), "Material0")

    # -- shape building ---------------------------------------------------
    @property
    def all_shapes(self):
        return [*self.spheres, *self.planes, *self.models]

    def add_sphere(self, position, radius, material: int = 0) -> Sphere:
        s = Sphere(material=material, position=tuple(position), radius=float(radius))
        self.spheres.append(s)
        return s

    def add_plane(self, position, normal, material: int = 0) -> Plane:
        p = Plane(material=material, position=tuple(position), normal=tuple(normal))
        self.planes.append(p)
        return p

    def add_model(self, span: Tuple[int, int], material: int = 0,
                  transform: Optional[np.ndarray] = None) -> Model:
        start, count = span
        m = Model(material=material, triangle_index=start, num_triangles=count)
        if transform is not None:
            m.transform = np.asarray(transform, np.float32)
        self.models.append(m)
        return m

    def add_box(self, position, size=(2.0, 2.0, 2.0), material: int = 0) -> Model:
        """Box instance; the 12 shared triangles are appended to the pool on
        first use (Box::create_triangle is called once at startup in the
        reference, main.cpp:102)."""
        if self._box_span is None:
            self._box_span = Box.create_triangles(self.pool)
        m = Box.model(material, self._box_span, tuple(position), tuple(size))
        self.models.append(m)
        return m

    def add_material(self, material: Material, name: Optional[str] = None) -> int:
        return self.materials.push(material, name)

    # -- editing operations (the ImGui editor's verbs as API,
    #    interface.cpp:106-310) -------------------------------------------
    def remove_shape(self, shape) -> None:
        """Delete a shape (the editor's per-row X button).

        Matches by IDENTITY, not equality: dataclass shapes compare by
        value, so `lst.remove(shape)` would delete the first value-equal
        element (removing the original instead of a duplicate) and a
        Model's ndarray transform makes __eq__ raise outright."""
        for lst in (self.spheres, self.planes, self.models):
            for i, s in enumerate(lst):
                if s is shape:
                    del lst[i]
                    return
        raise ValueError("shape not in scene")

    def duplicate_shape(self, shape):
        """Duplicate a shape (interface.cpp duplicate button); the copy
        shares mesh spans (instancing) but has independent fields."""
        import copy
        dup = copy.deepcopy(shape)
        if isinstance(shape, Sphere):
            self.spheres.append(dup)
        elif isinstance(shape, Plane):
            self.planes.append(dup)
        elif isinstance(shape, Model):
            self.models.append(dup)
        else:
            raise TypeError(type(shape))
        return dup

    def set_material(self, shape, material_index: int) -> None:
        """Assign a material (the editor's drag-drop assignment,
        interface.cpp:231-244)."""
        if not 0 <= material_index < len(self.materials):
            raise IndexError(material_index)
        shape.material = material_index

    def remove_material(self, index: int) -> None:
        """Delete a material with the editor's reindex semantics
        (interface.cpp:405-422)."""
        self.materials.remove(index, self.all_shapes)

    def set_model_transform(self, model: Model, transform) -> None:
        """Gizmo-style TRS edit: replace the instance transform (world AABB
        is derived at build; interface.cpp:98-101 recomputes it eagerly)."""
        model.transform = np.asarray(transform, np.float32)

    def import_model(self, path, material: int = 0,
                     transform: Optional[np.ndarray] = None) -> Model:
        """Load an STL/OBJ file into the shared pool and add an instance
        (the editor's model-import popup, interface.cpp:262-304)."""
        from ..io.obj import load_obj_model
        from ..io.stl import load_stl_model
        loader = (load_stl_model if str(path).lower().endswith(".stl")
                  else load_obj_model)
        span = loader(path, self.pool)
        if span is None:
            raise FileNotFoundError(path)
        return self.add_model(span, material=material, transform=transform)

    # -- device compilation ----------------------------------------------
    def build(self, refit: bool = False) -> DeviceScene:
        """Compile to the device pytree.  ``refit=True`` reuses the cached
        BVH topology for moved geometry (an interactive gizmo drag refits
        per frame and rebuilds on release — accel.refit_clusters)."""
        return DeviceScene(
            spheres=self._build_spheres(),
            planes=self._build_planes(),
            triangles=self._build_triangles(refit=refit),
            materials=self._build_materials(),
            sky=self._build_sky(),
            skybox=self._build_skybox(),
            flags=SceneFlags(sky_reachable=self.sky_reachable),
        )

    def _build_spheres(self) -> SpheresSoA:
        n = len(self.spheres)
        cap = _bucket(n)
        center = np.zeros((cap, 3), np.float32)
        radius = np.ones((cap,), np.float32)
        material = np.zeros((cap,), np.int32)
        active = np.zeros((cap,), bool)
        for i, s in enumerate(self.spheres):
            center[i] = s.position
            radius[i] = s.radius
            material[i] = s.material
            active[i] = True
        return SpheresSoA(center=_vec3_table(center), radius=jnp.asarray(radius),
                          material=jnp.asarray(material), active=jnp.asarray(active))

    def _build_planes(self) -> PlanesSoA:
        n = len(self.planes)
        cap = _bucket(n)
        position = np.zeros((cap, 3), np.float32)
        normal = np.zeros((cap, 3), np.float32)
        normal[:, 1] = 1.0
        material = np.zeros((cap,), np.int32)
        active = np.zeros((cap,), bool)
        for i, p in enumerate(self.planes):
            position[i] = p.position
            normal[i] = p.normal
            material[i] = p.material
            active[i] = True
        return PlanesSoA(position=_vec3_table(position), normal=_vec3_table(normal),
                         material=jnp.asarray(material), active=jnp.asarray(active))

    def _build_triangles(self, refit: bool = False) -> TrianglesSoA:
        """Flatten every model instance to world space (SURVEY C11: same
        span-into-pool instancing semantics, transform applied host-side
        once instead of per ray)."""
        pos_list, nrm_list, mat_list = [], [], []
        for m in self.models:
            wpos, wnrm = m.world_triangles(self.pool)
            pos_list.append(wpos)
            nrm_list.append(wnrm)
            mat_list.append(np.full((wpos.shape[0],), m.material, np.int32))
        if pos_list:
            pos = np.concatenate(pos_list)
            nrm = np.concatenate(nrm_list)
            mat = np.concatenate(mat_list)
        else:
            pos = np.zeros((0, 3, 3), np.float32)
            nrm = np.zeros((0, 3, 3), np.float32)
            mat = np.zeros((0,), np.int32)
        n = pos.shape[0]

        # Packet-culling acceleration for non-trivial meshes: BVH-reorder
        # the triangles (clusters = contiguous subtree ranges) and bake the
        # per-cluster kernel table.  Below the threshold the dense path is
        # faster than any culling.
        clusters_soa = None
        if n >= self.cluster_threshold:
            from .. import accel
            from ..ops.pallas.bvh_kernel import VMEM_TABLE_MAX_SLOTS

            def _padded_slots(c_raw: int, k: int) -> int:
                """Table slots AFTER bucket padding (the shape the kernel
                actually sees — mirrors the padding rule below)."""
                c_cap = (_bucket(c_raw, minimum=8) if c_raw <= 512
                         else ((c_raw + 127) // 128) * 128)
                return c_cap * k

            # auto K (see the cluster_size field comment): 64 while the
            # PADDED row table stays VMEM-resident, 128 beyond so the
            # packed tiles fill every lane and big meshes keep megakernel
            # eligibility.  Cluster fill (~90%) and bucket padding mean
            # the raw triangle count under-estimates the table, so the
            # decision checks the post-clustering padded size and
            # escalates; it is then cached per mesh topology so gizmo
            # refits never flip K mid-drag (K is a jit cache key).
            topo = (len(self.pool),
                    tuple((m.triangle_index, m.num_triangles)
                          for m in self.models))
            k_eff = self.cluster_size
            if not k_eff and self._auto_k is not None \
                    and self._auto_k[0] == topo:
                k_eff = self._auto_k[1]
            # BVH topology cache: with refit=True a transform-only edit
            # (gizmo drag) refits the cached tree in O(T) instead of a
            # full SAH rebuild — same coverage guarantees, degraded
            # spatial quality until the next full build()
            key = (k_eff, *topo)
            cached = self._cluster_topo
            if refit and k_eff and cached is not None and cached[0] == key:
                cl = accel.refit_clusters(cached[1], pos)
            elif k_eff:
                cl = accel.build_clusters(pos, k=k_eff)
                self._cluster_topo = (key, cl)
            elif n > VMEM_TABLE_MAX_SLOTS:
                # even PERFECTLY filled K=64 clusters would overflow the
                # budget (slots >= n): go straight to 128, no trial build
                k_eff = 128
                cl = accel.build_clusters(pos, k=k_eff)
                self._auto_k = (topo, k_eff)
                self._cluster_topo = ((k_eff, *topo), cl)
            else:
                cl = accel.build_clusters(pos, k=64)
                k_eff = 64
                if (_padded_slots(cl.slots.shape[0], 64)
                        > VMEM_TABLE_MAX_SLOTS):
                    cl = accel.build_clusters(pos, k=128)
                    k_eff = 128
                self._auto_k = (topo, k_eff)
                self._cluster_topo = ((k_eff, *topo), cl)
            # bucket-pad the cluster count with far-point sentinels
            # (every box plane at +3e38 — the kernels' slab gates cull
            # them via the near >= 1e38 term, see
            # bvh_kernel._visit_prepass) so a transform edit that
            # changes the raw cluster count doesn't change the table
            # shape — which is a jit cache key and would force a
            # recompile mid-drag.  Power-of-
            # two buckets up to 512 clusters; beyond that pad to a
            # multiple of 128 (a pow2 bucket would add up to +100%
            # sentinel clusters to the prepass and table of big meshes)
            c_raw, kk = cl.slots.shape
            if c_raw <= 512:
                c_cap = _bucket(c_raw, minimum=8)
            else:
                c_cap = ((c_raw + 127) // 128) * 128
            if c_cap > c_raw:
                pad_aabb = np.zeros((c_cap - c_raw, 8), np.float32)
                pad_aabb[:, 0:6] = 3.0e38
                cl = accel.Clusters(
                    aabb=np.concatenate([cl.aabb, pad_aabb]),
                    slots=np.concatenate(
                        [cl.slots,
                         np.full((c_cap - c_raw, kk), -1, np.int32)]),
                    order=cl.order, k=cl.k)
            perm = cl.order
            pos, nrm, mat = pos[perm], nrm[perm], mat[perm]
            e1 = pos[:, 1] - pos[:, 0]
            e2 = pos[:, 2] - pos[:, 0]
            slot = cl.slots                      # (C, K) into reordered tris
            valid = slot >= 0
            si = np.clip(slot, 0, n - 1)
            c, k = slot.shape
            # kernel table layout (bvh_kernel.py): one (slots, 128) row
            # per cluster slot (128 lanes so HBM DMA slices are
            # tile-aligned; VMEM padding made it 128 physically anyway),
            # the 19 shading attributes CONTIGUOUS in cols 0..18 so the
            # kernel extracts the winner's row with one matmul:
            # 0-8 v0/e1/e2, 9-17 n0/n1/n2, 18 material, 19 active,
            # 20 global index (f32), 21+ zero padding
            table_t = np.zeros((c * k, 128), np.float32)
            table_t[:, 0:3] = pos[si, 0].reshape(c * k, 3)
            table_t[:, 3:6] = e1[si].reshape(c * k, 3)
            table_t[:, 6:9] = e2[si].reshape(c * k, 3)
            table_t[:, 9:18] = nrm[si].reshape(c * k, 9)
            table_t[:, 18] = mat[si].reshape(-1).astype(np.float32)
            table_t[:, 19] = valid.reshape(-1).astype(np.float32)
            table_t[:, 20] = si.reshape(-1).astype(np.float32)
            # packed transposed copy for the HBM streaming kernel:
            # ceil(K/128) PACKETS of (24, 128) per cluster, attributes
            # on sublanes and 128 triangles on lanes per packet —
            # 96 B/triangle per DMA instead of the row layout's 512
            # (bvh_kernel._TROWS documents the win).  K > 128 needs
            # K % 128 == 0 so every packet's lanes map to a full slot
            # range (padding slots are active=0 rows, harmless)
            table_tr = None
            if k <= 128 or k % 128 == 0:
                p_n = (k + 127) // 128
                table_tr = np.zeros((c, p_n * 24, 128), np.float32)
                tt = table_t.reshape(c, k, 128)
                for p in range(p_n):
                    w = min(128, k - p * 128)
                    table_tr[:, p * 24:p * 24 + 21, :w] = (
                        tt[:, p * 128:p * 128 + w, :21]
                        .transpose(0, 2, 1))
                table_tr = jnp.asarray(table_tr)
            # 8 equal slot-range sub-boxes per cluster (K/8 triangles
            # each — contiguous BVH-DFS subtree ranges, so spatially
            # tight).  OPT-IN culling level (bvh_kernel.maybe_sub_aabb —
            # measured slower than plain per-sub-block MT on v5e): when
            # enabled the streaming/packed kernels gate Moller-Trumbore
            # per (sub-box, 128-ray sub-block) with them; empty ranges
            # become far-point sentinels the slab gates cull
            # (near >= 1e38, see bvh_kernel._visit_prepass).
            # K % 64 keeps every (K/8)-row sub-tile slice 8-sublane
            # aligned (Mosaic's dynamic sublane-slice requirement).
            # Only BUILT under the same knob that enables consumption —
            # default builds skip the O(T) host reductions + upload so
            # interactive refits (gizmo drags) never pay for an
            # experiment that is off
            sub_aabb = None
            if k % 64 == 0 and os.environ.get("SRT_BVH_SUBBOX", "0") != "0":
                vx = pos[si].reshape(c, 8, (k // 8) * 3, 3)
                mask = valid.reshape(c, 8, k // 8, 1)
                big = np.float32(3.0e38)
                mx = np.repeat(mask, 3, axis=2)      # one flag per vertex
                lo = np.where(mx, vx, big).min(axis=2)
                hi = np.where(mx, vx, -big).max(axis=2)
                empty = hi[:, :, 0:1] < lo[:, :, 0:1]
                lo = np.where(empty, big, lo)
                hi = np.where(empty, big, hi)
                sub_aabb = np.zeros((c * 8, 8), np.float32)
                sub_aabb[:, 0:3] = lo.reshape(c * 8, 3)
                sub_aabb[:, 3:6] = hi.reshape(c * 8, 3)
                sub_aabb = jnp.asarray(sub_aabb)
            clusters_soa = TriangleClustersSoA(
                aabb=jnp.asarray(cl.aabb), table_t=jnp.asarray(table_t),
                table_tr=table_tr, sub_aabb=sub_aabb)

        cap = _bucket(n)
        pad = cap - n
        # degenerate padding triangles (all-zero verts) are also masked out
        pos = np.concatenate([pos, np.zeros((pad, 3, 3), np.float32)])
        nrm = np.concatenate([nrm, np.zeros((pad, 3, 3), np.float32)])
        mat = np.concatenate([mat, np.zeros((pad,), np.int32)])
        active = np.arange(cap) < n
        shade = np.zeros((cap, 20), np.float32)
        shade[:, 0:9] = pos.reshape(cap, 9)
        shade[:, 9:18] = nrm.reshape(cap, 9)
        shade[:, 18] = mat.astype(np.float32)  # exact for < 2^24 materials
        return TrianglesSoA(
            v0=_vec3_table(pos[:, 0]), v1=_vec3_table(pos[:, 1]),
            v2=_vec3_table(pos[:, 2]),
            n0=_vec3_table(nrm[:, 0]), n1=_vec3_table(nrm[:, 1]),
            n2=_vec3_table(nrm[:, 2]),
            material=jnp.asarray(mat), active=jnp.asarray(active),
            shade=jnp.asarray(shade), clusters=clusters_soa,
        )

    def _build_materials(self) -> MaterialsSoA:
        mats = self.materials.materials or [Material()]
        n = len(mats)
        cap = _bucket(n, minimum=4)
        f = lambda attr, fill: np.array(
            [getattr(m, attr) for m in mats] + [fill] * (cap - n), np.float32)
        c = lambda attr: np.array(
            [getattr(m, attr) for m in mats] + [(0, 0, 0)] * (cap - n), np.float32)
        return MaterialsSoA(
            smoothness=jnp.asarray(f("smoothness", 0.0)),
            metallic=jnp.asarray(f("metallic", 0.0)),
            specular=jnp.asarray(f("specular", 0.0)),
            emission_strength=jnp.asarray(f("emission_strength", 0.0)),
            transmittance=jnp.asarray(f("transmittance", 0.0)),
            refraction_index=jnp.asarray(f("refraction_index", 1.0)),
            color=_vec3_table(c("color")),
            emission=_vec3_table(c("emission")),
        )

    def _build_sky(self) -> SkyParams:
        s = self.sky
        return SkyParams(
            sun_focus=jnp.float32(s.sun_focus),
            sun_intensity=jnp.float32(s.sun_intensity),
            sun_color=_vec3_scalar(s.sun_color),
            sun_direction=_vec3_scalar(s.sun_direction),
            horizon_color=_vec3_scalar(s.horizon_color),
            zenith_color=_vec3_scalar(s.zenith_color),
            ground_color=_vec3_scalar(s.ground_color),
        )

    def _build_skybox(self):
        # None selects the analytic gradient sky (render.cl:381-389) —
        # pure arithmetic, no texture gather.  Drop the cache too: it
        # holds a strong reference to the old host image + device
        # texture, which would otherwise stay pinned for the Scene's
        # lifetime after the skybox is cleared.
        if self.skybox is None:
            self._skybox_dev = None
            return None
        # memoized per image object: packing checks the whole texture and
        # device upload moves tens of MB — interactive edits that don't
        # touch the skybox shouldn't repay either.  The cache holds a
        # strong reference to the exact array object and compares with
        # `is` (an id() key alone can collide when CPython reuses a freed
        # array's address for the replacement image).  Contract: REPLACE
        # scene.skybox to change the environment; mutating the array in
        # place keeps the identity and returns the cached texture.
        if self._skybox_dev is not None and self._skybox_dev[0] is self.skybox:
            return self._skybox_dev[1]
        img = np.asarray(self.skybox, np.float32)
        from ..ops.sky import pack_skybox_quad
        dev = pack_skybox_quad(img)
        if dev is None:
            dev = Vec3(jnp.asarray(img[..., 0]), jnp.asarray(img[..., 1]),
                       jnp.asarray(img[..., 2]))
        self._skybox_dev = (self.skybox, dev)
        return dev
