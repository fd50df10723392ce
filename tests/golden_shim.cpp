// C-ABI shim around the reference's C++ cores (grid_subsampling.cpp,
// neighbors.cpp) for golden parity testing. The reference sources are
// compiled UNMODIFIED from a copy of /root/reference/KPConv-PyTorch/
// cpp_wrappers; only this shim (plain buffer marshalling, no algorithm
// code) is ours. Built on demand by tests/test_golden_reference.py; the
// original CPython wrapper.cpp no longer compiles against modern numpy
// headers, hence ctypes + this shim instead.

#include <cstring>
#include <vector>

#include "cpp_subsampling/grid_subsampling/grid_subsampling.h"
#include "cpp_neighbors/neighbors/neighbors.h"

extern "C" {

// Voxel-grid barycenter subsampling (grid_subsampling.cpp:5-106).
// Returns the number of voxels; writes at most `cap` rows into the out
// buffers (callers size cap = n so nothing is ever dropped).
long golden_grid_subsample(const float* points, long n,
                           const float* features, int fdim,
                           const int* classes, int ldim,
                           float sample_dl,
                           float* out_points, float* out_features,
                           int* out_classes, long cap) {
    std::vector<PointXYZ> pts(n), sub_pts;
    std::memcpy(pts.data(), points, size_t(n) * 3 * sizeof(float));
    std::vector<float> feats, sub_feats;
    std::vector<int> labs, sub_labs;
    if (features && fdim > 0) feats.assign(features, features + n * fdim);
    if (classes && ldim > 0) labs.assign(classes, classes + n * ldim);
    grid_subsampling(pts, sub_pts, feats, sub_feats, labs, sub_labs,
                     sample_dl, 0);
    long m = long(sub_pts.size());
    long mc = m < cap ? m : cap;
    std::memcpy(out_points, sub_pts.data(), size_t(mc) * 3 * sizeof(float));
    if (features && fdim > 0)
        std::memcpy(out_features, sub_feats.data(),
                    size_t(mc) * fdim * sizeof(float));
    if (classes && ldim > 0)
        std::memcpy(out_classes, sub_labs.data(),
                    size_t(mc) * ldim * sizeof(int));
    return m;
}

// Batched KD-tree radius search (neighbors.cpp:211-332). Returns max_count
// (the dense row width the reference emits); writes nq*max_count int32
// indices if that fits in `cap` entries. Shadow index == ns (stacked).
long golden_radius_neighbors(const float* queries, long nq,
                             const float* supports, long ns,
                             const int* q_batches, const int* s_batches,
                             int nb, float radius, int* out_indices,
                             long cap) {
    std::vector<PointXYZ> q(nq), s(ns);
    std::memcpy(q.data(), queries, size_t(nq) * 3 * sizeof(float));
    std::memcpy(s.data(), supports, size_t(ns) * 3 * sizeof(float));
    std::vector<int> qb(q_batches, q_batches + nb);
    std::vector<int> sb(s_batches, s_batches + nb);
    std::vector<int> inds;
    batch_nanoflann_neighbors(q, s, qb, sb, inds, radius);
    long max_count = nq > 0 ? long(inds.size() / size_t(nq)) : 0;
    if (long(inds.size()) <= cap)
        std::memcpy(out_indices, inds.data(), inds.size() * sizeof(int));
    return max_count;
}

}  // extern "C"
