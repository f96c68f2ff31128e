// Native host runtime for recon3d_tpu: point-cloud kernels.
//
// The reference leans on compiled libraries for these (scipy cKDTree,
// sklearn NearestNeighbors, OpenCV C++); this is our equivalent. Exposed
// through a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native      (g++ -O3 -march=native -fopenmp-simd)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <algorithm>

namespace {

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // large-prime spatial hash (same family the classic voxel filters use)
        return static_cast<size_t>(k.x * 73856093LL) ^
               static_cast<size_t>(k.y * 19349663LL) ^
               static_cast<size_t>(k.z * 83492791LL);
    }
};

inline CellKey cell_of(const float* p, float inv_voxel) {
    return CellKey{
        static_cast<int64_t>(std::floor(p[0] * inv_voxel)),
        static_cast<int64_t>(std::floor(p[1] * inv_voxel)),
        static_cast<int64_t>(std::floor(p[2] * inv_voxel)),
    };
}

}  // namespace

extern "C" {

// Keep the first point of every occupied voxel. Returns the number of kept
// indices written to out_idx (caller allocates n), or -1 on error.
long long voxel_downsample(const float* points, long long n, float voxel,
                           long long* out_idx) {
    if (n <= 0 || voxel <= 0.f) return 0;
    const float inv = 1.0f / voxel;
    std::unordered_set<CellKey, CellHash> seen;
    seen.reserve(static_cast<size_t>(n));
    long long m = 0;
    for (long long i = 0; i < n; ++i) {
        CellKey key = cell_of(points + 3 * i, inv);
        if (seen.insert(key).second) out_idx[m++] = i;
    }
    return m;
}

// Mean distance to the k nearest neighbors, via a uniform grid sized so the
// expected occupancy makes the 27-cell probe cover >= k candidates.
// Exact within the probed neighborhood; falls back to expanding rings when
// a point's neighborhood is sparse. Returns 0 on success.
int knn_mean_dist(const float* points, long long n, int k, float* out) {
    if (n <= 0 || k <= 0) return -1;
    if (n <= k) {
        for (long long i = 0; i < n; ++i) out[i] = 0.f;
        return 0;
    }

    float lo[3] = {points[0], points[1], points[2]};
    float hi[3] = {points[0], points[1], points[2]};
    for (long long i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], points[3 * i + d]);
            hi[d] = std::max(hi[d], points[3 * i + d]);
        }
    float diag = 0;
    for (int d = 0; d < 3; ++d) diag += (hi[d] - lo[d]) * (hi[d] - lo[d]);
    diag = std::sqrt(std::max(diag, 1e-12f));
    // Cell size targeting ~2k points in a 3x3x3 probe for uniform density.
    float vol = std::max((hi[0]-lo[0]) * (hi[1]-lo[1]) * (hi[2]-lo[2]), 1e-12f);
    float cell = std::cbrt(vol * (2.0f * k) / (27.0f * static_cast<float>(n)));
    cell = std::max(cell, diag * 1e-6f);
    const float inv = 1.0f / cell;

    std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
    grid.reserve(static_cast<size_t>(n));
    for (long long i = 0; i < n; ++i)
        grid[cell_of(points + 3 * i, inv)].push_back(i);

    std::vector<float> dists;
    for (long long i = 0; i < n; ++i) {
        const float* p = points + 3 * i;
        CellKey c = cell_of(p, inv);
        // Expand rings until >= k candidates, then probe ONE extra ring:
        // a neighbor of the true k-set can sit just across a cell boundary.
        int found_ring = -1;
        for (int ring = 1; ring <= 9; ++ring) {
            const bool extra = found_ring >= 0;
            dists.clear();
            for (int64_t dx = -ring; dx <= ring; ++dx)
                for (int64_t dy = -ring; dy <= ring; ++dy)
                    for (int64_t dz = -ring; dz <= ring; ++dz) {
                        auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
                        if (it == grid.end()) continue;
                        for (int64_t j : it->second) {
                            if (j == i) continue;
                            float ddx = p[0] - points[3 * j];
                            float ddy = p[1] - points[3 * j + 1];
                            float ddz = p[2] - points[3 * j + 2];
                            dists.push_back(ddx * ddx + ddy * ddy + ddz * ddz);
                        }
                    }
            if (extra) break;
            if (static_cast<int>(dists.size()) >= k) found_ring = ring;
        }
        int kk = std::min<int>(k, static_cast<int>(dists.size()));
        if (kk == 0) { out[i] = 0.f; continue; }
        std::partial_sort(dists.begin(), dists.begin() + kk, dists.end());
        float s = 0;
        for (int j = 0; j < kk; ++j) s += std::sqrt(dists[j]);
        out[i] = s / static_cast<float>(kk);
    }
    return 0;
}

// Nearest reference point for every query point (exact), via the same
// spatial hash: shells of cells are scanned outward until no closer shell
// can exist. Serves mesh-vertex coloring (dense/mesh.py), where query and
// reference counts both reach millions and the O(m*n) host fallback
// crawls. Returns 0 on success.
int nearest_index(const float* ref, long long n, const float* query,
                  long long m, long long* out_idx) {
    if (n <= 0 || m <= 0) return -1;

    if (n <= 256) {  // brute force beats any grid at this size
        for (long long qi = 0; qi < m; ++qi) {
            const float* q = query + 3 * qi;
            long long best = 0;
            float best_d2 = 0.f;
            for (long long j = 0; j < n; ++j) {
                float ddx = q[0] - ref[3 * j];
                float ddy = q[1] - ref[3 * j + 1];
                float ddz = q[2] - ref[3 * j + 2];
                float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (j == 0 || d2 < best_d2) { best = j; best_d2 = d2; }
            }
            out_idx[qi] = best;
        }
        return 0;
    }

    float lo[3] = {ref[0], ref[1], ref[2]};
    float hi[3] = {ref[0], ref[1], ref[2]};
    for (long long i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], ref[3 * i + d]);
            hi[d] = std::max(hi[d], ref[3 * i + d]);
        }
    float diag2 = 0;
    for (int d = 0; d < 3; ++d) diag2 += (hi[d] - lo[d]) * (hi[d] - lo[d]);
    const float diag = std::sqrt(std::max(diag2, 1e-12f));
    float vol = std::max(
        (hi[0] - lo[0]) * (hi[1] - lo[1]) * (hi[2] - lo[2]), 1e-12f);
    // ~2 reference points per occupied cell for uniform density; the
    // diag/256 floor bounds the worst-case shell walk for flat/degenerate
    // distributions (a near-zero volume otherwise collapses the cell size
    // and the search space explodes)
    float cell = std::cbrt(vol * 2.0f / static_cast<float>(n));
    cell = std::max(cell, diag / 256.0f);
    const float inv = 1.0f / cell;

    std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
    grid.reserve(static_cast<size_t>(n));
    for (long long i = 0; i < n; ++i)
        grid[cell_of(ref + 3 * i, inv)].push_back(i);

    const int max_ring = 2 + static_cast<int>(diag * inv);
    for (long long qi = 0; qi < m; ++qi) {
        const float* q = query + 3 * qi;
        CellKey c = cell_of(q, inv);
        long long best = -1;
        float best_d2 = 0.f;
        auto probe = [&](int64_t dx, int64_t dy, int64_t dz) {
            auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
            if (it == grid.end()) return;
            for (int64_t j : it->second) {
                float ddx = q[0] - ref[3 * j];
                float ddy = q[1] - ref[3 * j + 1];
                float ddz = q[2] - ref[3 * j + 2];
                float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (best < 0 || d2 < best_d2) { best = j; best_d2 = d2; }
            }
        };
        for (int ring = 0; ring <= max_ring; ++ring) {
            // a cell at Chebyshev ring r is at least (r-1)*cell away
            if (best >= 0) {
                const float reach = (static_cast<float>(ring) - 1.f) * cell;
                if (reach > 0.f && reach * reach > best_d2) break;
            }
            if (ring == 0) {
                probe(0, 0, 0);
                continue;
            }
            // faces only: O(ring^2) per shell, not O(ring^3)
            for (int64_t dy = -ring; dy <= ring; ++dy)
                for (int64_t dz = -ring; dz <= ring; ++dz) {
                    probe(-ring, dy, dz);
                    probe(ring, dy, dz);
                }
            for (int64_t dx = -ring + 1; dx <= ring - 1; ++dx)
                for (int64_t dz = -ring; dz <= ring; ++dz) {
                    probe(dx, -ring, dz);
                    probe(dx, ring, dz);
                }
            for (int64_t dx = -ring + 1; dx <= ring - 1; ++dx)
                for (int64_t dy = -ring + 1; dy <= ring - 1; ++dy) {
                    probe(dx, dy, -ring);
                    probe(dx, dy, ring);
                }
        }
        out_idx[qi] = best < 0 ? 0 : best;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PLY fast paths (host I/O for multi-million-point dense clouds).

#include <cstdio>
#include <cstdlib>

extern "C" {

// Append n ASCII "x y z r g b" rows to an already-open file position.
// Returns 0 on success, -1 on I/O error.
int ply_write_ascii_rows(const char* path, const float* points,
                         const unsigned char* colors, long long n) {
    FILE* f = std::fopen(path, "ab");
    if (!f) return -1;
    std::vector<char> buf(1 << 20);
    std::setvbuf(f, buf.data(), _IOFBF, buf.size());
    for (long long i = 0; i < n; ++i) {
        const float* p = points + 3 * i;
        const unsigned char* c = colors + 3 * i;
        if (std::fprintf(f, "%.6f %.6f %.6f %d %d %d\n",
                         static_cast<double>(p[0]), static_cast<double>(p[1]),
                         static_cast<double>(p[2]), c[0], c[1], c[2]) < 0) {
            std::fclose(f);
            return -1;
        }
    }
    return std::fclose(f) == 0 ? 0 : -1;
}

// Parse n ASCII vertex rows starting at byte `offset` of the file. Each row
// has `n_props` whitespace-separated numeric properties; all are parsed as
// double into out (n * n_props). Returns rows parsed, or -1 on error.
// Reads the region into memory once and strtod's through it (an order of
// magnitude faster than fscanf).
long long ply_parse_ascii_rows(const char* path, long long offset,
                               long long n, int n_props, double* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return -1; }
    const long long fsize = std::ftell(f);
    if (fsize < offset) { std::fclose(f); return -1; }
    if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
        std::fclose(f);
        return -1;
    }
    std::vector<char> data(static_cast<size_t>(fsize - offset) + 1);
    size_t got = std::fread(data.data(), 1, data.size() - 1, f);
    std::fclose(f);
    data[got] = 0;

    const char* p = data.data();
    const char* lim = data.data() + got;
    const long long total = n * n_props;
    for (long long i = 0; i < total; ++i) {
        // skip whitespace
        while (p < lim && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= lim) return i / n_props;
        // fast fixed-decimal parse (sign, int part, fraction, exponent,
        // nan/inf tokens)
        bool neg = false;
        if (*p == '-') { neg = true; ++p; }
        else if (*p == '+') ++p;
        if (p + 2 < lim && (*p == 'n' || *p == 'N')) {
            out[i] = std::nan("");
            p += 3;  // "nan"
            continue;
        }
        if (p + 2 < lim && (*p == 'i' || *p == 'I')) {
            out[i] = neg ? -HUGE_VAL : HUGE_VAL;
            p += 3;  // "inf"
            if (p + 4 < lim && (*p == 'i' || *p == 'I')) p += 5;  // "inity"
            continue;
        }
        const char* digits_start = p;
        double v = 0.0;
        while (p < lim && *p >= '0' && *p <= '9')
            v = v * 10.0 + (*p++ - '0');
        if (p < lim && *p == '.') {
            ++p;
            double frac = 0.0, scale = 1.0;
            while (p < lim && *p >= '0' && *p <= '9') {
                frac = frac * 10.0 + (*p++ - '0');
                scale *= 10.0;
            }
            v += frac / scale;
        }
        if (p == digits_start && (p >= lim || *p != '.'))
            return i / n_props;  // no progress: malformed token
        if (p < lim && (*p == 'e' || *p == 'E')) {
            ++p;
            bool eneg = false;
            if (p < lim && (*p == '-' || *p == '+')) eneg = (*p++ == '-');
            int ex = 0;
            while (p < lim && *p >= '0' && *p <= '9') ex = ex * 10 + (*p++ - '0');
            v *= std::pow(10.0, eneg ? -ex : ex);
        }
        out[i] = neg ? -v : v;
    }
    return n;
}

}  // extern "C"
