"""Host acceleration structures: BVH build + native library bindings.

The BVH is a new capability over the reference (its README lists "Bounding
volume hierarchies" as future work, README.md:41; it ships only per-model
AABB culling, render.cl:316-319).  The build runs on the host at scene
compile (like the reference's C++ host layer); traversal runs on-device.

Layout (consumed by the traversal kernels):
  nodes:  (N, 8) f32 — [min.xyz, max.xyz, pad, pad], DFS preorder
  meta:   (N, 4) i32 — [skip, first, count, is_leaf]; `skip` is the DFS
          index to jump to when the node's AABB is missed (next sibling or
          ancestor's sibling; N terminates), `first/count` index the
          REORDERED triangle array for leaves
  order:  (T,) i32 — permutation applied to the triangle arrays so each
          leaf's triangles are contiguous

Two implementations with identical semantics: the C++ binned-SAH builder
in native/srt_native.cpp (loaded via ctypes) and a NumPy median-split
fallback.  `build_bvh` prefers native.
"""
from __future__ import annotations

import ctypes
import os
from typing import NamedTuple, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    candidates = [
        os.environ.get("SRT_NATIVE_LIB"),
        os.path.join(_NATIVE_DIR, "libsrt_native.so"),
        os.path.join(os.path.dirname(__file__), "libsrt_native.so"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.srt_bvh_build.restype = ctypes.c_int32
            lib.srt_bvh_build.argtypes = [f32p, ctypes.c_int32,
                                          ctypes.c_int32, f32p, i32p, i32p]
            lib.srt_transform_triangles.restype = None
            lib.srt_transform_triangles.argtypes = [f32p, f32p, f32p,
                                                    ctypes.c_int32, f32p,
                                                    f32p, f32p]
            lib.srt_stl_count.restype = ctypes.c_int32
            lib.srt_stl_count.argtypes = [u8p, ctypes.c_int64]
            lib.srt_stl_parse.restype = ctypes.c_int32
            lib.srt_stl_parse.argtypes = [u8p, ctypes.c_int64, f32p, f32p]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load_library() is not None


def build_native() -> bool:
    """Compile native/libsrt_native.so with make (no-op if unavailable)."""
    import subprocess

    makefile_dir = os.path.abspath(_NATIVE_DIR)
    if not os.path.exists(os.path.join(makefile_dir, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", makefile_dir], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _LIB_TRIED
    _LIB_TRIED = False
    return native_available()


class BVH(NamedTuple):
    nodes: np.ndarray   # (N, 8) f32
    meta: np.ndarray    # (N, 4) i32: [skip, first, count, is_leaf]
    order: np.ndarray   # (T,) i32

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh(positions: np.ndarray, leaf_size: int = 4,
              force_python: bool = False) -> BVH:
    """Build a BVH over (T, 3, 3) world-space triangle positions."""
    positions = np.ascontiguousarray(positions, np.float32)
    t = positions.shape[0]
    if t == 0:
        return BVH(nodes=np.zeros((0, 8), np.float32),
                   meta=np.zeros((0, 4), np.int32),
                   order=np.zeros((0,), np.int32))
    lib = None if force_python else _load_library()
    if lib is not None:
        cap = 2 * t + 1
        nodes = np.zeros((cap, 8), np.float32)
        meta = np.zeros((cap, 4), np.int32)
        order = np.zeros((t,), np.int32)
        n = lib.srt_bvh_build(_f32p(positions), t, leaf_size, _f32p(nodes),
                              _i32p(meta), _i32p(order))
        if n >= 0:
            return BVH(nodes=nodes[:n].copy(), meta=meta[:n].copy(),
                       order=order)
    return _build_bvh_python(positions, leaf_size)


def _build_bvh_python(positions: np.ndarray, leaf_size: int) -> BVH:
    """Median-split fallback builder (same output layout, simpler splits)."""
    t = positions.shape[0]
    lo = positions.min(axis=1)
    hi = positions.max(axis=1)
    centroid = (lo + hi) * 0.5

    nodes, meta = [], []
    order = np.arange(t, dtype=np.int32)

    def rec(idx: np.ndarray, depth: int) -> int:
        node_id = len(nodes)
        nodes.append(None)
        meta.append(None)
        box_lo = lo[idx].min(axis=0)
        box_hi = hi[idx].max(axis=0)
        if len(idx) <= leaf_size or depth > 60:
            nodes[node_id] = (box_lo, box_hi)
            meta[node_id] = [-1, idx, len(idx), 1]
            return node_id
        axis = int(np.argmax(box_hi - box_lo))
        med = np.argsort(centroid[idx, axis], kind="stable")
        half = len(idx) // 2
        left_idx, right_idx = idx[med[:half]], idx[med[half:]]
        nodes[node_id] = (box_lo, box_hi)
        meta[node_id] = [rec(left_idx, depth + 1), None, 0, 0]
        meta[node_id][1] = rec(right_idx, depth + 1)
        return node_id

    rec(order, 0)
    n = len(nodes)

    # flatten: assign leaf ranges in DFS order, compute skip links
    node_arr = np.zeros((n, 8), np.float32)
    meta_arr = np.zeros((n, 4), np.int32)
    new_order = []
    skip = np.full(n, n, np.int32)
    for i in range(n):
        m = meta[i]
        if not m[3]:
            left, right = m[0], m[1]
            skip[left] = right
            skip[right] = skip[i]
    for i in range(n):
        box_lo, box_hi = nodes[i]
        node_arr[i, :3] = box_lo
        node_arr[i, 3:6] = box_hi
        m = meta[i]
        if m[3]:
            first = len(new_order)
            new_order.extend(m[1].tolist())
            meta_arr[i] = [skip[i], first, m[2], 1]
        else:
            meta_arr[i] = [skip[i], -1, 0, 0]
    return BVH(nodes=node_arr, meta=meta_arr,
               order=np.asarray(new_order, np.int32))


def transform_triangles(positions: np.ndarray, normals: np.ndarray,
                        matrix: np.ndarray, force_python: bool = False):
    """World-space transform + AABB (native or NumPy; same math as
    Model.world_triangles)."""
    positions = np.ascontiguousarray(positions, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    matrix = np.ascontiguousarray(matrix, np.float32)
    n = positions.shape[0]
    lib = None if force_python else _load_library()
    if lib is not None and n > 0:
        pos_out = np.empty_like(positions)
        nrm_out = np.empty_like(normals)
        aabb = np.empty(6, np.float32)
        lib.srt_transform_triangles(_f32p(positions), _f32p(normals),
                                    _f32p(matrix), n, _f32p(pos_out),
                                    _f32p(nrm_out), _f32p(aabb))
        return pos_out, nrm_out, (aabb[:3], aabb[3:])
    wpos = positions @ matrix[:3, :3].T + matrix[:3, 3]
    wnrm = normals @ matrix[:3, :3].T
    flat = wpos.reshape(-1, 3)
    if flat.shape[0]:
        box = (flat.min(axis=0), flat.max(axis=0))
    else:
        box = (np.full(3, np.inf, np.float32), np.full(3, -np.inf, np.float32))
    return wpos, wnrm, box


def parse_stl_native(data: bytes):
    """Parse a binary STL buffer with the native parser; None if no lib."""
    lib = _load_library()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    count = lib.srt_stl_count(buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), len(data))
    if count < 0:
        return None
    pos = np.empty((count, 3, 3), np.float32)
    nrm = np.empty((count, 3, 3), np.float32)
    lib.srt_stl_parse(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      len(data), _f32p(pos), _f32p(nrm))
    return pos, nrm


class Clusters(NamedTuple):
    """Fixed-size triangle clusters cut from a BVH, for the TPU packet
    culling kernel: per-cluster AABB + exactly K triangle slots (padded
    with inactive entries).  `order` is the BVH permutation — the caller
    must reorder its triangle arrays by it so cluster slot c*K+s refers to
    reordered triangle `slots[c, s]`."""
    aabb: np.ndarray    # (C, 8) f32: [min.xyz, max.xyz, pad, pad]
    slots: np.ndarray   # (C, K) i32: reordered triangle index, -1 = pad
    order: np.ndarray   # (T,) i32: BVH reorder permutation
    k: int


def build_clusters(positions: np.ndarray, k: int = 256,
                   leaf_size: int = 8) -> Clusters:
    """Cut a SAH BVH into spatial clusters of at most `k` triangles.

    Two stages: (1) cut the tree into GRANULES — whole subtrees of at
    most k/4 triangles, so their ranges are contiguous in the
    BVH-reordered array — then (2) greedily pack DFS-consecutive
    granules into clusters of at most k (box = union).  Cutting whole
    subtrees directly at k averages ~62% slot fill (subtree sizes don't
    align to k); the pack stage reaches ~90%, which is what lets an 82K-
    triangle packed table stay inside the megakernel's VMEM budget.
    DFS-adjacent subtrees are spatial siblings, so union boxes stay
    tight and culling quality is preserved."""
    t = positions.shape[0]
    if t == 0:
        return Clusters(aabb=np.zeros((0, 8), np.float32),
                        slots=np.zeros((0, k), np.int32),
                        order=np.zeros((0,), np.int32), k=k)
    bvh = build_bvh(positions, leaf_size=min(leaf_size, k))
    n = bvh.num_nodes
    skip = bvh.meta[:, 0]
    is_leaf = bvh.meta[:, 3] == 1
    leaf_counts = np.where(is_leaf, bvh.meta[:, 2], 0)
    pref = np.concatenate([[0], np.cumsum(leaf_counts)])
    # first reordered-triangle index of the subtree rooted at i = the
    # `first` of the next leaf at or after i (leaf firsts are DFS-ordered)
    next_leaf_first = np.full(n + 1, t, np.int64)
    for i in range(n - 1, -1, -1):
        next_leaf_first[i] = (bvh.meta[i, 1] if is_leaf[i]
                              else next_leaf_first[i + 1])

    granule = max(min(leaf_size, k), k // 4)
    g_boxes, g_firsts, g_counts = [], [], []
    i = 0
    while i < n:
        count = pref[skip[i]] - pref[i]
        if count <= granule or is_leaf[i]:
            first = int(next_leaf_first[i])
            # an oversized leaf (e.g. the python builder's depth cutoff)
            # is split across several granules sharing its box rather
            # than silently dropping triangles past slot k
            for off in range(0, max(int(count), 1), k):
                g_boxes.append(np.asarray(bvh.nodes[i, :6], np.float32))
                g_firsts.append(first + off)
                g_counts.append(min(int(count) - off, k))
            i = int(skip[i])
        else:
            i += 1

    # pack consecutive granules (their ranges are contiguous in DFS
    # order, so packed clusters stay contiguous slot ranges)
    boxes, firsts, counts = [], [], []
    for box, first, count in zip(g_boxes, g_firsts, g_counts):
        if counts and counts[-1] + count <= k \
                and firsts[-1] + counts[-1] == first:
            counts[-1] += count
            boxes[-1] = np.concatenate(
                [np.minimum(boxes[-1][:3], box[:3]),
                 np.maximum(boxes[-1][3:6], box[3:6])])
        else:
            boxes.append(box.copy())
            firsts.append(first)
            counts.append(count)

    c = len(boxes)
    aabb = np.zeros((c, 8), np.float32)
    aabb[:, :6] = np.asarray(boxes, np.float32)
    slots = np.full((c, k), -1, np.int32)
    for ci, (first, count) in enumerate(zip(firsts, counts)):
        assert 0 <= count <= k, f"cluster {ci}: count {count} > k {k}"
        slots[ci, :count] = np.arange(first, first + count, dtype=np.int32)
    return Clusters(aabb=aabb, slots=slots, order=bvh.order, k=k)


def refit_clusters(cl: Clusters, positions: np.ndarray) -> Clusters:
    """Recompute cluster AABBs for MOVED geometry, reusing the topology.

    The standard BVH refit trade-off: the permutation and slot assignment
    built for the old positions stay valid for ANY new positions (every
    triangle is still covered exactly once and each new box bounds its
    triangles — culling stays conservative), only the spatial quality
    degrades as objects move far from where the tree was built.  An
    interactive transform drag refits per frame (O(T) numpy min/max) and
    rebuilds on release; a full SAH rebuild is ~54 ms at 82K triangles
    vs ~5 ms for this.

    `positions` are the UNREORDERED (T, 3, 3) world vertices (the same
    array build_clusters was/would be given)."""
    t = positions.shape[0]
    if t == 0 or cl.slots.shape[0] == 0:
        return cl
    rp = positions[cl.order]                      # (T, 3, 3) reordered
    si = np.clip(cl.slots, 0, t - 1)              # (C, K)
    v = rp[si]                                    # (C, K, 3, 3)
    invalid = (cl.slots < 0)[:, :, None, None]
    lo = np.where(invalid, np.inf, v).min(axis=(1, 2))
    hi = np.where(invalid, -np.inf, v).max(axis=(1, 2))
    aabb = np.zeros_like(cl.aabb)
    aabb[:, 0:3] = lo
    aabb[:, 3:6] = hi
    return Clusters(aabb=aabb.astype(np.float32), slots=cl.slots,
                    order=cl.order, k=cl.k)


def validate_bvh(bvh: BVH, positions: np.ndarray) -> None:
    """Structural invariants: every triangle in exactly one leaf; every
    leaf box contains its triangles; skip links in-range and increasing."""
    t = positions.shape[0]
    seen = np.zeros(t, bool)
    n = bvh.num_nodes
    for i in range(n):
        skip, first, count, is_leaf = bvh.meta[i]
        assert i < skip <= n, f"node {i}: bad skip {skip}"
        if is_leaf:
            idx = bvh.order[first:first + count]
            assert not seen[idx].any(), "triangle in two leaves"
            seen[idx] = True
            tri = positions[idx]
            lo = bvh.nodes[i, :3]
            hi = bvh.nodes[i, 3:6]
            assert (tri.reshape(-1, 3) >= lo - 1e-4).all()
            assert (tri.reshape(-1, 3) <= hi + 1e-4).all()
    assert seen.all(), "triangle missing from all leaves"
