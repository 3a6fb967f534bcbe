// alphasurf_tpu native runtime — CPU-side C++ components.
//
// TPU-native framework split: JAX/XLA/Pallas owns the device compute path;
// this library owns the host runtime around it, the analog of the parts of
// the reference that live in native code but never touch the GPU:
//   * iso-surface triangulation (replaces the reference's PyMCubes C++
//     dependency used by SparseGrid.extract_mesh, svox2/svox2.py:4583-4689)
//   * voxel-hash point-cloud downsampling (opt/exract_points.py radius
//     subsampling before Chamfer eval)
//   * multithreaded permutation gather for epoch ray shuffling
//     (opt/util/dataset_base.py:27-78 shuffle_rays over ~100M rays)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: alphasurf_tpu/utils/native.py compiles this on first use.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <thread>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Marching tetrahedra over a dense (X,Y,Z) scalar field.
//
// Same 6-tetra cube decomposition and vertex ordering as the Python
// implementation in alphasurf_tpu/geometry/extract.py (kept bit-compatible
// so the Python path remains a differential-test oracle). Corner order is
// the reference's z-fastest order (svox2.py:1016-1038).
// ---------------------------------------------------------------------------

static const int TETS[6][4] = {
    {0, 5, 1, 3}, {0, 5, 3, 7}, {0, 5, 7, 4},
    {0, 7, 3, 2}, {0, 7, 2, 6}, {0, 7, 6, 4},
};
static const double CORNERS[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

struct V3 { double x, y, z; };

static inline V3 interp(const V3& pa, const V3& pb, double va, double vb) {
    double t = va / (va - vb + 1e-30);
    return {pa.x + t * (pb.x - pa.x), pa.y + t * (pb.y - pa.y),
            pa.z + t * (pb.z - pa.z)};
}

// First pass returns the triangle count so the caller can allocate; second
// pass fills. handle != nullptr between calls (opaque vector<double>*).
struct MTState { std::vector<double> tris; };

void* mt_run(const float* field, int64_t X, int64_t Y, int64_t Z,
             double level, int64_t* n_tris_out, int n_threads) {
    auto* st = new MTState();
    if (n_threads < 1) n_threads = 1;
    int64_t n_cells_x = X - 1;
    std::vector<std::vector<double>> parts((size_t)n_threads);

    auto worker = [&](int ti) {
        std::vector<double>& out = parts[(size_t)ti];
        for (int64_t cx = ti; cx < n_cells_x; cx += n_threads) {
            for (int64_t cy = 0; cy < Y - 1; ++cy) {
                for (int64_t cz = 0; cz < Z - 1; ++cz) {
                    double cv[8];
                    bool all_pos = true, all_neg = true;
                    for (int k = 0; k < 8; ++k) {
                        int64_t ix = cx + (int64_t)CORNERS[k][0];
                        int64_t iy = cy + (int64_t)CORNERS[k][1];
                        int64_t iz = cz + (int64_t)CORNERS[k][2];
                        double v = (double)field[(ix * Y + iy) * Z + iz] - level;
                        cv[k] = v;
                        all_pos &= (v > 0);
                        all_neg &= (v < 0);
                    }
                    if (all_pos || all_neg) continue;
                    for (int t = 0; t < 6; ++t) {
                        double v[4];
                        V3 p[4];
                        int n_in = 0;
                        bool in[4];
                        for (int k = 0; k < 4; ++k) {
                            int c = TETS[t][k];
                            v[k] = cv[c];
                            p[k] = {CORNERS[c][0] + (double)cx,
                                    CORNERS[c][1] + (double)cy,
                                    CORNERS[c][2] + (double)cz};
                            in[k] = v[k] < 0;
                            n_in += in[k];
                        }
                        auto emit = [&](const V3& a, const V3& b, const V3& c) {
                            out.insert(out.end(), {a.x, a.y, a.z, b.x, b.y,
                                                   b.z, c.x, c.y, c.z});
                        };
                        if (n_in == 1 || n_in == 3) {
                            bool want = (n_in == 1);
                            int ai = 0;
                            for (int k = 0; k < 4; ++k)
                                if (in[k] == want) { ai = k; break; }
                            V3 e[3];
                            int m = 0;
                            for (int k = 0; k < 4; ++k)
                                if (k != ai)
                                    e[m++] = interp(p[ai], p[k], v[ai], v[k]);
                            emit(e[0], e[1], e[2]);
                        } else if (n_in == 2) {
                            int ii[2], oo[2], mi = 0, mo = 0;
                            for (int k = 0; k < 4; ++k)
                                (in[k] ? ii[mi++] : oo[mo++]) = k;
                            V3 e00 = interp(p[ii[0]], p[oo[0]], v[ii[0]], v[oo[0]]);
                            V3 e01 = interp(p[ii[0]], p[oo[1]], v[ii[0]], v[oo[1]]);
                            V3 e10 = interp(p[ii[1]], p[oo[0]], v[ii[1]], v[oo[0]]);
                            V3 e11 = interp(p[ii[1]], p[oo[1]], v[ii[1]], v[oo[1]]);
                            emit(e00, e01, e11);
                            emit(e00, e11, e10);
                        }
                    }
                }
            }
        }
    };
    std::vector<std::thread> threads;
    for (int ti = 0; ti < n_threads; ++ti) threads.emplace_back(worker, ti);
    for (auto& t : threads) t.join();
    for (auto& pt : parts)
        st->tris.insert(st->tris.end(), pt.begin(), pt.end());
    *n_tris_out = (int64_t)(st->tris.size() / 9);
    return st;
}

void mt_fetch(void* handle, double* verts_out) {
    auto* st = (MTState*)handle;
    std::memcpy(verts_out, st->tris.data(), st->tris.size() * sizeof(double));
    delete st;
}

// ---------------------------------------------------------------------------
// Voxel-hash downsample: keep the first point (lowest index) in every cubic
// cell of side `radius`. Returns number kept; indices written ascending.
// ---------------------------------------------------------------------------

int64_t voxel_downsample(const float* pts, int64_t n, double radius,
                         int64_t* keep_idx_out) {
    if (radius <= 0) {
        for (int64_t i = 0; i < n; ++i) keep_idx_out[i] = i;
        return n;
    }
    std::unordered_map<uint64_t, int64_t> first;
    first.reserve((size_t)n * 2);
    const double inv = 1.0 / radius;
    for (int64_t i = 0; i < n; ++i) {
        int64_t kx = (int64_t)std::floor(pts[3 * i + 0] * inv);
        int64_t ky = (int64_t)std::floor(pts[3 * i + 1] * inv);
        int64_t kz = (int64_t)std::floor(pts[3 * i + 2] * inv);
        // 21 bits per axis, offset to positive
        uint64_t key = (((uint64_t)(kx + (1 << 20)) & 0x1FFFFF) << 42) |
                       (((uint64_t)(ky + (1 << 20)) & 0x1FFFFF) << 21) |
                       ((uint64_t)(kz + (1 << 20)) & 0x1FFFFF);
        auto it = first.find(key);
        if (it == first.end()) first.emplace(key, i);
    }
    int64_t m = 0;
    for (auto& kv : first) keep_idx_out[m++] = kv.second;
    std::sort(keep_idx_out, keep_idx_out + m);
    return m;
}

// ---------------------------------------------------------------------------
// Threaded permutation gather: out[i] = src[perm[i]] over rows of width
// `cols` float32. The epoch-shuffle hot path for ~1e8 x 8 ray tables.
// ---------------------------------------------------------------------------

void shuffle_gather_f32(const float* src, const int64_t* perm, float* out,
                        int64_t n_rows, int64_t cols, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    auto worker = [&](int ti) {
        int64_t lo = n_rows * ti / n_threads;
        int64_t hi = n_rows * (ti + 1) / n_threads;
        for (int64_t i = lo; i < hi; ++i)
            std::memcpy(out + i * cols, src + perm[i] * cols,
                        (size_t)cols * sizeof(float));
    };
    std::vector<std::thread> threads;
    for (int ti = 0; ti < n_threads; ++ti) threads.emplace_back(worker, ti);
    for (auto& t : threads) t.join();
}

}  // extern "C"
