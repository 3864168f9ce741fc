// Host-side dual-tree traversal (interaction-list builder).
//
// Native companion to photons_tpu/ops/traversal.py: the same
// level-synchronized classification (reference MAC semantics,
// fmm.c:266-325) over the balanced binary tree, but as a cache-friendly
// recursive walk on the host -- the architecture the reference uses
// (walk_task_p2p / walk_task_m2l run on the CPU while the GPU computes,
// fmm.c:402-534).  Useful when the walk-on-host / compute-on-device
// pipeline wins: very deep trees, or overlap of list building for step
// n+1 with device compute for step n.
//
// Tree layout: per-level arrays concatenated in heap order; level d has
// 2^d nodes at offset (2^d - 1).  Semantics match the jitted traversal
// bit-for-bit (same-level expansion, child-level classification) so the
// two backends are interchangeable and cross-checked in tests.
//
// Build: g++ -O3 -march=native -shared -fPIC traversal.cpp -o libphotons_native.so

#include <cstdint>
#include <cmath>
#include <cstring>

namespace {

struct Ctx {
    const double* centers;   // (n_nodes, 3), heap order
    const double* widths;    // (n_nodes, 3)
    const int64_t* counts;   // (n_nodes,)
    int depth;               // leaf level
    double theta2;
    double cutoff2;          // <0: no cutoff (no LONGSHORT discard)
    double boxsize;          // <0: non-periodic
    double adjacency_eps;

    int32_t* m2l;            // (m2l_cap, 2) shared across levels
    int64_t* m2l_level_count; // (depth+1,)
    int64_t m2l_cap;
    int64_t m2l_total;
    int32_t* m2l_levels;     // (m2l_cap,) level tag per pair

    int32_t* p2p;            // (p2p_cap, 2)
    int64_t p2p_cap;
    int64_t p2p_count;
    int overflow;
};

inline double min_image(double d, double box) {
    if (box > 0.0) d -= box * std::nearbyint(d / box);
    return d;
}

// 1 = accept (M2L), 0 = open, -1 = discard.  Mirrors acceptance()
// semantics with particle-AABB boxes and min-image displacement.
int classify(const Ctx& c, int64_t a, int64_t b) {
    if (c.counts[a] == 0 || c.counts[b] == 0) return -1;
    const double* ca = c.centers + 3 * a;
    const double* cb = c.centers + 3 * b;
    const double* wa = c.widths + 3 * a;
    const double* wb = c.widths + 3 * b;

    double dd2 = 0.0, dm2 = 0.0, gap_sum = 0.0, wmax = 0.0;
    for (int k = 0; k < 3; ++k) {
        double dist = min_image(ca[k] - cb[k], c.boxsize);
        double w = 0.5 * (wa[k] + wb[k]);
        double gap = std::fabs(dist) - w;
        if (gap < 0.0) gap = 0.0;
        dd2 += dist * dist;
        dm2 += gap * gap;
        gap_sum += gap;
        if (w > wmax) wmax = w;
    }
    int flag = ((2.0 * wmax) * (2.0 * wmax) < c.theta2 * dd2) ? 1 : 0;
    if (c.cutoff2 >= 0.0) {
        if (dd2 > c.cutoff2) flag = 0;     // force-open near the cutoff
        if (dm2 >= c.cutoff2) return -1;   // fully beyond: discard
    }
    if (gap_sum < c.adjacency_eps) flag = 0;
    return flag;
}

void visit(Ctx& c, int d, int64_t i, int64_t j) {
    // (i, j) is an open pair at level d; expand to level d+1
    const int dc = d + 1;
    const int64_t off = (int64_t(1) << dc) - 1;
    const int64_t kids_i[2] = {2 * i, 2 * i + 1};
    const int64_t kids_j[2] = {2 * j, 2 * j + 1};
    for (int a = 0; a < 2; ++a) {
        for (int b = 0; b < 2; ++b) {
            const int64_t ni = kids_i[a], nj = kids_j[b];
            const int flag = classify(c, off + ni, off + nj);
            if (flag < 0) continue;
            if (flag == 1) {
                if (c.m2l_total < c.m2l_cap) {
                    c.m2l[2 * c.m2l_total] = int32_t(ni);
                    c.m2l[2 * c.m2l_total + 1] = int32_t(nj);
                    c.m2l_levels[c.m2l_total] = dc;
                } else {
                    c.overflow = 1;
                }
                ++c.m2l_total;
                ++c.m2l_level_count[dc];
            } else if (dc == c.depth) {
                if (c.p2p_count < c.p2p_cap) {
                    c.p2p[2 * c.p2p_count] = int32_t(ni);
                    c.p2p[2 * c.p2p_count + 1] = int32_t(nj);
                } else {
                    c.overflow = 1;
                }
                ++c.p2p_count;
            } else {
                visit(c, dc, ni, nj);
            }
        }
    }
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 on capacity overflow (counts still report the
// true totals so the caller can resize and retry).
int photons_dual_tree_traverse(
    const double* centers, const double* widths, const int64_t* counts,
    int depth, double theta, double cutoff, double boxsize,
    double adjacency_eps,
    int32_t* m2l_pairs, int32_t* m2l_levels, int64_t m2l_cap,
    int32_t* p2p_pairs, int64_t p2p_cap,
    int64_t* m2l_level_count, int64_t* out_m2l_total,
    int64_t* out_p2p_count) {
    Ctx c;
    c.centers = centers;
    c.widths = widths;
    c.counts = counts;
    c.depth = depth;
    c.theta2 = theta * theta;
    c.cutoff2 = cutoff < 0.0 ? -1.0 : cutoff * cutoff;
    c.boxsize = boxsize;
    c.adjacency_eps = adjacency_eps;
    c.m2l = m2l_pairs;
    c.m2l_levels = m2l_levels;
    c.m2l_cap = m2l_cap;
    c.m2l_total = 0;
    c.m2l_level_count = m2l_level_count;
    c.p2p = p2p_pairs;
    c.p2p_cap = p2p_cap;
    c.p2p_count = 0;
    c.overflow = 0;
    std::memset(m2l_level_count, 0, sizeof(int64_t) * (depth + 1));

    if (depth == 0) {
        // single leaf: the root pair is the only (self) P2P task
        if (counts[0] > 0) {
            if (p2p_cap >= 1) {
                p2p_pairs[0] = 0;
                p2p_pairs[1] = 0;
            } else {
                c.overflow = 1;
            }
            c.p2p_count = 1;
        }
    } else {
        visit(c, 0, 0, 0);
    }
    *out_m2l_total = c.m2l_total;
    *out_p2p_count = c.p2p_count;
    return c.overflow;
}

}  // extern "C"
