// Binned-SAH BVH builder — native fast path for scene/bvh.py.
//
// Same algorithm and output layout as the numpy builder (authoritative for
// semantics): 16-bin surface-area heuristic on centroid extents, splitting
// until count <= leaf_size; arrays {bounds_lo, bounds_hi, left, right,
// first, count, prim_order}.  Single-threaded recursive build with an
// explicit stack; ~2M tris in a few seconds vs ~10 min in numpy.
//
// ABI (ctypes, see scene/native.py):
//   int  m3t_build_bvh(const float* verts, int64 n_verts,
//                      const int32* faces, int64 n_faces, int leaf_size,
//                      void** handle, int64* n_nodes)
//   void m3t_copy_bvh(handle, float* lo, float* hi, int32* left,
//                     int32* right, int32* first, int32* count,
//                     int32* prim_order, int32* max_leaf)
//   void m3t_free_bvh(handle)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int N_BINS = 16;
constexpr int MAX_DEPTH = 60;

struct V3 {
    float x, y, z;
    V3() : x(FLT_MAX), y(FLT_MAX), z(FLT_MAX) {}
    V3(float a, float b, float c) : x(a), y(b), z(c) {}
};

struct AABB {
    V3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
    V3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
    void grow(const V3& p) {
        lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
        lo.z = std::min(lo.z, p.z);
        hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
        hi.z = std::max(hi.z, p.z);
    }
    // component-wise merge: growing by an EMPTY box (lo=+FLT_MAX,
    // hi=-FLT_MAX) must be a no-op — treating its corners as points would
    // corrupt the accumulator to infinite bounds (and inf SAH costs)
    void grow(const AABB& b) {
        lo.x = std::min(lo.x, b.lo.x); lo.y = std::min(lo.y, b.lo.y);
        lo.z = std::min(lo.z, b.lo.z);
        hi.x = std::max(hi.x, b.hi.x); hi.y = std::max(hi.y, b.hi.y);
        hi.z = std::max(hi.z, b.hi.z);
    }
    float area() const {
        float dx = std::max(hi.x - lo.x, 0.f);
        float dy = std::max(hi.y - lo.y, 0.f);
        float dz = std::max(hi.z - lo.z, 0.f);
        return 2.f * (dx * dy + dy * dz + dz * dx);
    }
};

struct Node {
    AABB box;
    int32_t left = -1, right = -1, first = 0, count = 0;
};

struct BVHOut {
    std::vector<Node> nodes;
    std::vector<int32_t> order;
    int32_t max_leaf = 1;
};

struct BuildItem { int32_t node; int64_t begin, end; int depth; };

}  // namespace

extern "C" {

int m3t_build_bvh(const float* verts, int64_t n_verts, const int32_t* faces,
                  int64_t n_faces, int leaf_size, void** handle,
                  int64_t* n_nodes_out) {
    (void)n_verts;
    auto* out = new BVHOut();
    const int64_t F = n_faces;

    std::vector<AABB> prim(F);
    std::vector<V3> cent(F);
    for (int64_t i = 0; i < F; ++i) {
        AABB b;
        for (int k = 0; k < 3; ++k) {
            const float* v = verts + 3 * (int64_t)faces[3 * i + k];
            b.grow(V3(v[0], v[1], v[2]));
        }
        prim[i] = b;
        cent[i] = V3(0.5f * (b.lo.x + b.hi.x), 0.5f * (b.lo.y + b.hi.y),
                     0.5f * (b.lo.z + b.hi.z));
    }
    out->order.resize(F);
    for (int64_t i = 0; i < F; ++i) out->order[i] = (int32_t)i;

    out->nodes.reserve((size_t)(2.5 * (double)F / leaf_size) + 16);
    out->nodes.push_back(Node{});
    std::vector<BuildItem> stack;
    stack.push_back({0, 0, F, 0});

    while (!stack.empty()) {
        BuildItem it = stack.back();
        stack.pop_back();
        Node& node = out->nodes[it.node];
        const int64_t cnt = it.end - it.begin;

        AABB gbox, cbox;
        for (int64_t i = it.begin; i < it.end; ++i) {
            gbox.grow(prim[out->order[i]]);
            cbox.grow(cent[out->order[i]]);
        }
        node.box = gbox;

        if (cnt <= leaf_size || it.depth >= MAX_DEPTH) {
            node.first = (int32_t)it.begin;
            node.count = (int32_t)cnt;
            out->max_leaf = std::max(out->max_leaf, node.count);
            continue;
        }

        // binned SAH over 3 axes
        float best_cost = FLT_MAX;
        int best_axis = -1, best_bin = -1;
        float cmin[3] = {cbox.lo.x, cbox.lo.y, cbox.lo.z};
        float cmax[3] = {cbox.hi.x, cbox.hi.y, cbox.hi.z};
        for (int axis = 0; axis < 3; ++axis) {
            float ext = cmax[axis] - cmin[axis];
            if (ext <= 1e-12f) continue;
            float inv = N_BINS / ext;
            AABB bbox[N_BINS];
            int64_t bcnt[N_BINS] = {0};
            for (int64_t i = it.begin; i < it.end; ++i) {
                const V3& c = cent[out->order[i]];
                float cv = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
                int b = std::min((int)((cv - cmin[axis]) * inv), N_BINS - 1);
                bbox[b].grow(prim[out->order[i]]);
                bcnt[b]++;
            }
            AABB lbox[N_BINS];
            int64_t lcnt[N_BINS];
            AABB acc;
            int64_t ac = 0;
            for (int b = 0; b < N_BINS; ++b) {
                acc.grow(bbox[b]); ac += bcnt[b];
                lbox[b] = acc; lcnt[b] = ac;
            }
            AABB racc;
            int64_t rc = 0;
            for (int b = N_BINS - 1; b >= 1; --b) {
                racc.grow(bbox[b]); rc += bcnt[b];
                int64_t nl = lcnt[b - 1];
                if (nl == 0 || rc == 0) continue;
                float cost = lbox[b - 1].area() * nl + racc.area() * rc;
                if (cost < best_cost) {
                    best_cost = cost; best_axis = axis; best_bin = b - 1;
                }
            }
        }

        int64_t mid;
        if (best_axis < 0) {
            // degenerate (e.g. coincident centroids): median-split by order
            // so leaves never exceed leaf_size (the wide collapse packs at
            // most 8 triangles per leaf row)
            mid = it.begin + cnt / 2;
        } else {
            float inv = N_BINS / (cmax[best_axis] - cmin[best_axis]);
            auto goes_left = [&](int32_t p) {
                const V3& c = cent[p];
                float cv = best_axis == 0 ? c.x
                           : (best_axis == 1 ? c.y : c.z);
                int b = std::min((int)((cv - cmin[best_axis]) * inv),
                                 N_BINS - 1);
                return b <= best_bin;
            };
            int32_t* first_ptr = out->order.data() + it.begin;
            int32_t* mid_ptr = std::partition(
                first_ptr, out->order.data() + it.end, goes_left);
            mid = it.begin + (mid_ptr - first_ptr);
            if (mid == it.begin || mid == it.end) mid = it.begin + cnt / 2;
        }

        int32_t li = (int32_t)out->nodes.size();
        out->nodes.push_back(Node{});
        int32_t ri = (int32_t)out->nodes.size();
        out->nodes.push_back(Node{});
        out->nodes[it.node].left = li;
        out->nodes[it.node].right = ri;
        out->nodes[it.node].count = 0;
        stack.push_back({ri, mid, it.end, it.depth + 1});
        stack.push_back({li, it.begin, mid, it.depth + 1});
    }

    *handle = out;
    *n_nodes_out = (int64_t)out->nodes.size();
    return 0;
}

void m3t_copy_bvh(void* handle, float* lo, float* hi, int32_t* left,
                  int32_t* right, int32_t* first, int32_t* count,
                  int32_t* prim_order, int32_t* max_leaf) {
    auto* out = (BVHOut*)handle;
    const size_t n = out->nodes.size();
    for (size_t i = 0; i < n; ++i) {
        const Node& nd = out->nodes[i];
        lo[3 * i] = nd.box.lo.x; lo[3 * i + 1] = nd.box.lo.y;
        lo[3 * i + 2] = nd.box.lo.z;
        hi[3 * i] = nd.box.hi.x; hi[3 * i + 1] = nd.box.hi.y;
        hi[3 * i + 2] = nd.box.hi.z;
        left[i] = nd.left; right[i] = nd.right;
        first[i] = nd.first; count[i] = nd.count;
    }
    memcpy(prim_order, out->order.data(), out->order.size() * sizeof(int32_t));
    *max_leaf = out->max_leaf;
}

void m3t_free_bvh(void* handle) { delete (BVHOut*)handle; }

}  // extern "C"
