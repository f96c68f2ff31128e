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

}  // extern "C"
