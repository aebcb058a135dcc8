// Host-side contiguity kernel: which plan features touch which.
//
// The exact host engine rebuilds the feature contiguity graph every
// environment step (urban_tpu/envs/plan_client.py _get_current_graph,
// mirroring the reference's per-step libpysal fuzzy_contiguity rebuild,
// reference plan_client.py:250-263). The numpy implementation is the host
// engine's bottleneck (dense M^2 segment-distance matrix); this kernel uses
// a uniform spatial hash over segment bounding boxes so the work is
// near-linear in the number of segments.
//
// Built with plain g++ into a shared library, bound via ctypes
// (urban_tpu/geometry/native.py); no pybind11 dependency.
//
// Exported C ABI:
//   int contiguity_pairs(const double* segs,   // (M, 4): x0,y0,x1,y1
//                        const int32_t* owner, // (M,) feature index per seg
//                        int64_t m,
//                        int32_t n_features,
//                        double tol,
//                        int32_t* out_pairs,   // (cap, 2) output buffer
//                        int64_t cap);
//   returns number of pairs written, or -1 if the buffer was too small.

#include <cmath>
#include <cstdint>
#include <unordered_set>
#include <vector>

namespace {

struct Grid {
    double minx, miny, cell;
    int nx, ny;
    std::vector<std::vector<int>> bins;
    int bin_of(double x, double y) const {
        int ix = (int)((x - minx) / cell);
        int iy = (int)((y - miny) / cell);
        if (ix < 0) ix = 0;
        if (iy < 0) iy = 0;
        if (ix >= nx) ix = nx - 1;
        if (iy >= ny) iy = ny - 1;
        return iy * nx + ix;
    }
};

inline double seg_point_dist2(double px, double py, double ax, double ay,
                              double bx, double by) {
    double abx = bx - ax, aby = by - ay;
    double apx = px - ax, apy = py - ay;
    double denom = abx * abx + aby * aby;
    double t = denom > 0 ? (apx * abx + apy * aby) / denom : 0.0;
    if (t < 0) t = 0;
    if (t > 1) t = 1;
    double dx = px - (ax + t * abx), dy = py - (ay + t * aby);
    return dx * dx + dy * dy;
}

inline double cross(double ox, double oy, double ax, double ay, double bx,
                    double by) {
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox);
}

inline bool segs_touch(const double* a, const double* b, double tol2,
                       double tol) {
    // proper crossing
    double d1 = cross(b[0], b[1], b[2], b[3], a[0], a[1]);
    double d2 = cross(b[0], b[1], b[2], b[3], a[2], a[3]);
    double d3 = cross(a[0], a[1], a[2], a[3], b[0], b[1]);
    double d4 = cross(a[0], a[1], a[2], a[3], b[2], b[3]);
    if (((d1 > tol && d2 < -tol) || (d1 < -tol && d2 > tol)) &&
        ((d3 > tol && d4 < -tol) || (d3 < -tol && d4 > tol)))
        return true;
    if (seg_point_dist2(a[0], a[1], b[0], b[1], b[2], b[3]) <= tol2) return true;
    if (seg_point_dist2(a[2], a[3], b[0], b[1], b[2], b[3]) <= tol2) return true;
    if (seg_point_dist2(b[0], b[1], a[0], a[1], a[2], a[3]) <= tol2) return true;
    if (seg_point_dist2(b[2], b[3], a[0], a[1], a[2], a[3]) <= tol2) return true;
    return false;
}

}  // namespace

extern "C" int64_t contiguity_pairs(const double* segs, const int32_t* owner,
                                    int64_t m, int32_t n_features, double tol,
                                    int32_t* out_pairs, int64_t cap) {
    if (m <= 0) return 0;
    // bounds
    double minx = 1e300, miny = 1e300, maxx = -1e300, maxy = -1e300;
    double total_len = 0.0;
    for (int64_t i = 0; i < m; ++i) {
        const double* s = segs + 4 * i;
        minx = std::fmin(minx, std::fmin(s[0], s[2]));
        maxx = std::fmax(maxx, std::fmax(s[0], s[2]));
        miny = std::fmin(miny, std::fmin(s[1], s[3]));
        maxy = std::fmax(maxy, std::fmax(s[1], s[3]));
        total_len += std::hypot(s[2] - s[0], s[3] - s[1]);
    }
    double avg_len = total_len / (double)m + 1e-9;
    double cell = std::fmax(avg_len, 1e-6);
    Grid g;
    g.minx = minx - tol;
    g.miny = miny - tol;
    g.cell = cell;
    g.nx = std::max(1, (int)((maxx - minx) / cell) + 2);
    g.ny = std::max(1, (int)((maxy - miny) / cell) + 2);
    if ((int64_t)g.nx * g.ny > 4 * m + 64) {
        // cap grid size for degenerate aspect ratios
        double scale = std::sqrt((double)g.nx * g.ny / (4.0 * m + 64));
        g.cell *= scale;
        g.nx = std::max(1, (int)((maxx - minx) / g.cell) + 2);
        g.ny = std::max(1, (int)((maxy - miny) / g.cell) + 2);
    }
    g.bins.assign((size_t)g.nx * g.ny, {});

    // insert segments into all bins their bbox (padded by tol) overlaps
    for (int64_t i = 0; i < m; ++i) {
        const double* s = segs + 4 * i;
        double x0 = std::fmin(s[0], s[2]) - tol, x1 = std::fmax(s[0], s[2]) + tol;
        double y0 = std::fmin(s[1], s[3]) - tol, y1 = std::fmax(s[1], s[3]) + tol;
        int bx0 = g.bin_of(x0, y0) % g.nx, by0 = g.bin_of(x0, y0) / g.nx;
        int bx1 = g.bin_of(x1, y1) % g.nx, by1 = g.bin_of(x1, y1) / g.nx;
        for (int by = by0; by <= by1; ++by)
            for (int bx = bx0; bx <= bx1; ++bx)
                g.bins[(size_t)by * g.nx + bx].push_back((int)i);
    }

    double tol2 = tol * tol;
    std::unordered_set<int64_t> seen;
    int64_t count = 0;
    for (size_t b = 0; b < g.bins.size(); ++b) {
        const auto& bin = g.bins[b];
        for (size_t p = 0; p < bin.size(); ++p) {
            for (size_t q = p + 1; q < bin.size(); ++q) {
                int i = bin[p], j = bin[q];
                int32_t oi = owner[i], oj = owner[j];
                if (oi == oj) continue;
                int32_t lo = oi < oj ? oi : oj, hi = oi < oj ? oj : oi;
                int64_t key = (int64_t)lo * n_features + hi;
                if (seen.count(key)) continue;
                if (!segs_touch(segs + 4 * i, segs + 4 * j, tol2, tol))
                    continue;
                seen.insert(key);
                if (count >= cap) return -1;
                out_pairs[2 * count] = lo;
                out_pairs[2 * count + 1] = hi;
                ++count;
            }
        }
    }
    return count;
}
