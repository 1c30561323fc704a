// srt_native: host-side native runtime for the TPU path tracer.
//
// The reference's host layer is C++ (scene management, mesh parsing —
// src/parser.cpp, src/shape.cpp); this library is its counterpart for the
// TPU engine's host side: the performance-critical scene-compile steps that
// run per scene edit, not per ray:
//   * binned-SAH BVH build over world-space triangles, flattened to a
//     DFS-ordered node array with skip links (the layout the Pallas packet
//     traversal kernel consumes), with leaf triangle ranges contiguous
//     after an in-place triangle reorder
//   * binary STL triangle parsing (wired into io/stl.py's loader; a pure
//     byte reinterpretation, so it is BIT-exact with the NumPy fallback)
//   * world-space triangle transform + AABB recompute — an optional fast
//     path exposed through accel.transform_triangles.  NOT wired into
//     Model.world_triangles: its scalar FMA ordering differs from the
//     NumPy matmul in final float LSBs, and the golden-image determinism
//     contract (SURVEY §4) requires the scene compile to be independent
//     of whether this library is present.
//
// Exposed as a C ABI for ctypes; ships alongside a pure-Python fallback
// (simple_raytracer_tpu/accel.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
  V3() : x(0), y(0), z(0) {}
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
};

inline V3 vmin(const V3 &a, const V3 &b) {
  return V3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
inline V3 vmax(const V3 &a, const V3 &b) {
  return V3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
  V3 lo{1e30f, 1e30f, 1e30f};
  V3 hi{-1e30f, -1e30f, -1e30f};
  void grow(const V3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  void grow(const AABB &b) {
    lo = vmin(lo, b.lo);
    hi = vmax(hi, b.hi);
  }
  float area() const {
    float dx = std::max(0.0f, hi.x - lo.x);
    float dy = std::max(0.0f, hi.y - lo.y);
    float dz = std::max(0.0f, hi.z - lo.z);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
  }
};

struct BuildPrim {
  AABB box;
  V3 centroid;
  int32_t index;  // original triangle index
};

struct BuildNode {
  AABB box;
  int32_t left = -1, right = -1;  // children (build-time indices)
  int32_t first = -1, count = 0;  // leaf triangle range (into reordered order)
};

struct Builder {
  std::vector<BuildPrim> prims;
  std::vector<BuildNode> nodes;
  int leaf_size;

  int build(int begin, int end, int depth) {
    BuildNode node;
    for (int i = begin; i < end; i++) node.box.grow(prims[i].box);
    int n = end - begin;
    int node_id = (int)nodes.size();
    nodes.push_back(node);

    if (n <= leaf_size || depth > 60) {
      nodes[node_id].first = begin;
      nodes[node_id].count = n;
      return node_id;
    }

    // binned SAH over the centroid extent, 16 bins per axis
    AABB cbox;
    for (int i = begin; i < end; i++) cbox.grow(prims[i].centroid);
    constexpr int NBINS = 16;
    float best_cost = 1e30f;
    int best_axis = -1, best_split = -1;

    for (int axis = 0; axis < 3; axis++) {
      float lo = axis == 0 ? cbox.lo.x : axis == 1 ? cbox.lo.y : cbox.lo.z;
      float hi = axis == 0 ? cbox.hi.x : axis == 1 ? cbox.hi.y : cbox.hi.z;
      if (hi - lo < 1e-12f) continue;
      float scale = NBINS / (hi - lo);

      AABB bins[NBINS];
      int counts[NBINS] = {0};
      for (int i = begin; i < end; i++) {
        float c = axis == 0   ? prims[i].centroid.x
                  : axis == 1 ? prims[i].centroid.y
                              : prims[i].centroid.z;
        int b = std::min(NBINS - 1, std::max(0, (int)((c - lo) * scale)));
        bins[b].grow(prims[i].box);
        counts[b]++;
      }
      // sweep
      AABB right_acc[NBINS];
      AABB acc;
      for (int b = NBINS - 1; b > 0; b--) {
        acc.grow(bins[b]);
        right_acc[b] = acc;
      }
      AABB left_acc;
      int left_count = 0;
      for (int b = 0; b < NBINS - 1; b++) {
        left_acc.grow(bins[b]);
        left_count += counts[b];
        int right_count = n - left_count;
        if (left_count == 0 || right_count == 0) continue;
        float cost = left_acc.area() * left_count +
                     right_acc[b + 1].area() * right_count;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_split = b;
        }
      }
    }

    int mid;
    if (best_axis < 0 || best_cost >= nodes[node_id].box.area() * n) {
      // SAH says a leaf is cheaper (or no valid split): median fallback
      // unless small enough to just be a leaf
      if (n <= 4 * leaf_size) {
        nodes[node_id].first = begin;
        nodes[node_id].count = n;
        return node_id;
      }
      int axis = 0;
      V3 ext(cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
             cbox.hi.z - cbox.lo.z);
      if (ext.y > ext.x) axis = 1;
      if (ext.z > (axis == 0 ? ext.x : ext.y)) axis = 2;
      mid = begin + n / 2;
      std::nth_element(prims.begin() + begin, prims.begin() + mid,
                       prims.begin() + end,
                       [axis](const BuildPrim &a, const BuildPrim &b) {
                         float ca = axis == 0   ? a.centroid.x
                                    : axis == 1 ? a.centroid.y
                                                : a.centroid.z;
                         float cb = axis == 0   ? b.centroid.x
                                    : axis == 1 ? b.centroid.y
                                                : b.centroid.z;
                         return ca < cb;
                       });
    } else {
      float lo = best_axis == 0   ? cbox.lo.x
                 : best_axis == 1 ? cbox.lo.y
                                  : cbox.lo.z;
      float hi = best_axis == 0   ? cbox.hi.x
                 : best_axis == 1 ? cbox.hi.y
                                  : cbox.hi.z;
      float scale = NBINS / (hi - lo);
      auto part = std::partition(
          prims.begin() + begin, prims.begin() + end,
          [&](const BuildPrim &p) {
            float c = best_axis == 0   ? p.centroid.x
                      : best_axis == 1 ? p.centroid.y
                                       : p.centroid.z;
            int b = std::min(NBINS - 1, std::max(0, (int)((c - lo) * scale)));
            return b <= best_split;
          });
      mid = (int)(part - prims.begin());
      if (mid == begin || mid == end) mid = begin + n / 2;
    }

    int l = build(begin, mid, depth + 1);
    int r = build(mid, end, depth + 1);
    nodes[node_id].left = l;
    nodes[node_id].right = r;
    return node_id;
  }
};

}  // namespace

extern "C" {

// Build a BVH over `n` triangles given as (n, 3, 3) float32 vertex
// positions.  Outputs (caller-allocated, sizes via srt_bvh_node_bound):
//   nodes_out:  (num_nodes, 8) f32: [min.xyz, max.xyz, pad, pad] — the
//               two trailing columns are zero padding (8-wide rows keep
//               the array sublane-aligned for the device tables)
//   meta_out:   (num_nodes, 4) i32: [skip, first, count, is_leaf]
//   order_out:  (n,) i32: reordered triangle order (leaf ranges contiguous)
// Returns the number of nodes, or -1 on error.
int32_t srt_bvh_build(const float *tris, int32_t n, int32_t leaf_size,
                      float *nodes_out, int32_t *meta_out,
                      int32_t *order_out) {
  if (n <= 0) return 0;
  Builder b;
  b.leaf_size = leaf_size < 1 ? 4 : leaf_size;
  b.prims.resize(n);
  for (int i = 0; i < n; i++) {
    const float *t = tris + (size_t)i * 9;
    AABB box;
    box.grow(V3(t[0], t[1], t[2]));
    box.grow(V3(t[3], t[4], t[5]));
    box.grow(V3(t[6], t[7], t[8]));
    b.prims[i].box = box;
    b.prims[i].centroid =
        V3((box.lo.x + box.hi.x) * 0.5f, (box.lo.y + box.hi.y) * 0.5f,
           (box.lo.z + box.hi.z) * 0.5f);
    b.prims[i].index = i;
  }
  b.nodes.reserve((size_t)2 * n);
  b.build(0, n, 0);

  // flatten to DFS order with skip links
  int num = (int)b.nodes.size();
  // build-time order IS DFS preorder (build() pushes parent before
  // recursing), so node i's DFS index is i already.
  // skip link of node i = next sibling-or-ancestor-sibling in preorder:
  // compute via recursion replay.
  std::vector<int32_t> skip(num, num);
  // iterative: skip[root]=num; for inner node: skip[left]=right,
  // skip[right]=skip[node]
  for (int i = 0; i < num; i++) {
    const BuildNode &nd = b.nodes[i];
    if (nd.left >= 0) {
      skip[nd.left] = nd.right;
      skip[nd.right] = skip[i];
    }
  }

  for (int i = 0; i < num; i++) {
    const BuildNode &nd = b.nodes[i];
    float *out = nodes_out + (size_t)i * 8;
    out[0] = nd.box.lo.x;
    out[1] = nd.box.lo.y;
    out[2] = nd.box.lo.z;
    out[3] = nd.box.hi.x;
    out[4] = nd.box.hi.y;
    out[5] = nd.box.hi.z;
    out[6] = 0.0f;
    out[7] = 0.0f;
    int32_t *m = meta_out + (size_t)i * 4;
    m[0] = skip[i];
    m[1] = nd.count > 0 ? nd.first : -1;
    m[2] = nd.count;
    m[3] = nd.count > 0 ? 1 : 0;
  }
  for (int i = 0; i < n; i++) order_out[i] = b.prims[i].index;
  return num;
}

// Transform (n, 3, 3) f32 triangle positions and normals by a 4x4 row-major
// matrix (positions: full affine; normals: linear part only) and compute
// the world AABB.  In/out may alias.
void srt_transform_triangles(const float *pos_in, const float *nrm_in,
                             const float *mat4, int32_t n, float *pos_out,
                             float *nrm_out, float *aabb_out /*6*/) {
  const float *m = mat4;
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < (int64_t)n * 3; i++) {
    const float *p = pos_in + i * 3;
    const float *q = nrm_in + i * 3;
    float px = m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3];
    float py = m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7];
    float pz = m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11];
    float nx = m[0] * q[0] + m[1] * q[1] + m[2] * q[2];
    float ny = m[4] * q[0] + m[5] * q[1] + m[6] * q[2];
    float nz = m[8] * q[0] + m[9] * q[1] + m[10] * q[2];
    pos_out[i * 3 + 0] = px;
    pos_out[i * 3 + 1] = py;
    pos_out[i * 3 + 2] = pz;
    nrm_out[i * 3 + 0] = nx;
    nrm_out[i * 3 + 1] = ny;
    nrm_out[i * 3 + 2] = nz;
    lo[0] = std::min(lo[0], px);
    lo[1] = std::min(lo[1], py);
    lo[2] = std::min(lo[2], pz);
    hi[0] = std::max(hi[0], px);
    hi[1] = std::max(hi[1], py);
    hi[2] = std::max(hi[2], pz);
  }
  for (int k = 0; k < 3; k++) {
    aabb_out[k] = lo[k];
    aabb_out[3 + k] = hi[k];
  }
}

// Parse a binary STL buffer (mirrors the record layout the reference reads,
// src/parser.cpp:24-37: 80-byte header, u32 count, 50-byte records).
// Returns triangle count, or -1 if the buffer is malformed.  pos_out /
// nrm_out must hold count*9 floats (count from srt_stl_count).
int32_t srt_stl_count(const uint8_t *buf, int64_t len) {
  if (len < 84) return -1;
  uint32_t count;
  std::memcpy(&count, buf + 80, 4);
  if ((int64_t)84 + (int64_t)count * 50 > len) {
    // tolerate truncated files by clamping like a stream read would
    count = (uint32_t)((len - 84) / 50);
  }
  return (int32_t)count;
}

int32_t srt_stl_parse(const uint8_t *buf, int64_t len, float *pos_out,
                      float *nrm_out) {
  int32_t count = srt_stl_count(buf, len);
  if (count < 0) return -1;
  for (int32_t i = 0; i < count; i++) {
    const uint8_t *rec = buf + 84 + (int64_t)i * 50;
    float v[12];
    std::memcpy(v, rec, 48);
    for (int k = 0; k < 3; k++) {
      // flat shading: file normal copied to all three vertices
      nrm_out[(int64_t)i * 9 + k * 3 + 0] = v[0];
      nrm_out[(int64_t)i * 9 + k * 3 + 1] = v[1];
      nrm_out[(int64_t)i * 9 + k * 3 + 2] = v[2];
      pos_out[(int64_t)i * 9 + k * 3 + 0] = v[3 + k * 3 + 0];
      pos_out[(int64_t)i * 9 + k * 3 + 1] = v[3 + k * 3 + 1];
      pos_out[(int64_t)i * 9 + k * 3 + 2] = v[3 + k * 3 + 2];
    }
  }
  return count;
}

}  // extern "C"
