// Host-side native ops for spconv_tpu.
//
// Role parity with the reference's CPU backend (spconv's CPU wheel is its
// hardware-free golden/reference implementation and powers the host data
// pipeline): rulebook construction, voxelization and box ops in C++,
// exposed through a C ABI consumed via ctypes (no pybind11 in this
// environment).  The TPU compute path never calls these; they serve
//   * the data-loading pipeline (voxelize on host while TPU trains),
//   * golden-model testing of the XLA rulebook builder,
//   * CPU-only deployments (reference: CPU_ONLY_BUILD Native-algo path).
//
// Behavioral parity targets:
//   - subm + regular + transposed pair generation
//     (spconv/csrc/sparse/indices.py semantics, hash-map based)
//   - Point2VoxelCPU (spconv/csrc/sparse/pointops.py:493-766)
//   - gather/scatter-add (spconv/csrc/sparse/gather.py)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Rulebook generation.
//
// indices:        [n, ndim+1] int32, batch-first; rows with indices[i*?]<0
//                 are padding.
// pair_fwd:       [kv, n_out_cap] int32, filled with -1 then pairs.
// pair_bwd:       [kv, n] int32.
// out_indices:    [n_out_cap, ndim+1] int32 (-1 padded). For subm, equals
//                 the input indices (caller reuses input).
// Returns number of active output sites (or -1 on capacity overflow).
// ---------------------------------------------------------------------------

static inline int64_t linearize(const int32_t* c, const int32_t* shape,
                                int ndim) {
  int64_t key = c[0];
  for (int d = 0; d < ndim; ++d) key = key * shape[d] + c[d + 1];
  return key;
}

int32_t spconv_generate_subm_pairs(
    const int32_t* indices, int64_t n, int32_t ndim,
    const int32_t* spatial_shape, const int32_t* ksize,
    const int32_t* dilation, int32_t* pair_fwd, int32_t* pair_bwd) {
  int64_t kv = 1;
  for (int d = 0; d < ndim; ++d) kv *= ksize[d];
  std::fill(pair_fwd, pair_fwd + kv * n, -1);
  std::fill(pair_bwd, pair_bwd + kv * n, -1);

  std::unordered_map<int64_t, int32_t> table;
  table.reserve(n * 2);
  int32_t n_act = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = indices + i * (ndim + 1);
    if (row[0] < 0) continue;
    table.emplace(linearize(row, spatial_shape, ndim), (int32_t)i);
    ++n_act;
  }

  std::vector<int32_t> off(ndim), coord(ndim + 1);
  const int64_t center = kv / 2;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = indices + i * (ndim + 1);
    if (row[0] < 0) continue;
    // center offset: identity
    pair_fwd[center * n + i] = (int32_t)i;
    pair_bwd[center * n + i] = (int32_t)i;
    // probe only the first half; mirror symmetric (indices.py:757-804)
    for (int64_t k = 0; k < center; ++k) {
      int64_t rem = k;
      bool ok = true;
      coord[0] = row[0];
      for (int d = ndim - 1; d >= 0; --d) {
        off[d] = (int32_t)(rem % ksize[d]);
        rem /= ksize[d];
      }
      for (int d = 0; d < ndim; ++d) {
        int32_t c = row[d + 1] + (off[d] - ksize[d] / 2) * dilation[d];
        if (c < 0 || c >= spatial_shape[d]) { ok = false; break; }
        coord[d + 1] = c;
      }
      if (!ok) continue;
      auto it = table.find(linearize(coord.data(), spatial_shape, ndim));
      if (it == table.end()) continue;
      int32_t a = it->second;  // site at coord(i)+d_k feeds i via offset k
      pair_fwd[k * n + i] = a;
      pair_bwd[k * n + a] = (int32_t)i;
      // mirror offset kv-1-k
      pair_fwd[(kv - 1 - k) * n + a] = (int32_t)i;
      pair_bwd[(kv - 1 - k) * n + i] = a;
    }
  }
  return n_act;
}

int32_t spconv_generate_conv_pairs(
    const int32_t* indices, int64_t n, int32_t ndim,
    const int32_t* spatial_shape, const int32_t* out_shape,
    const int32_t* ksize, const int32_t* stride, const int32_t* padding,
    const int32_t* dilation, int32_t transposed, int64_t out_cap,
    int32_t* pair_fwd, int32_t* pair_bwd, int32_t* out_indices) {
  int64_t kv = 1;
  for (int d = 0; d < ndim; ++d) kv *= ksize[d];
  std::fill(pair_fwd, pair_fwd + kv * out_cap, -1);
  std::fill(pair_bwd, pair_bwd + kv * n, -1);
  std::fill(out_indices, out_indices + out_cap * (ndim + 1), -1);

  // candidate out keys per (k, i), then sort-unique in key order so row
  // ids match the XLA builder (smallest keys kept on overflow)
  struct Cand { int64_t key; int32_t k, i; int32_t coord[8]; };
  std::vector<Cand> cands;
  cands.reserve(n * 4);
  std::vector<int32_t> off(ndim);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = indices + i * (ndim + 1);
    if (row[0] < 0) continue;
    for (int64_t k = 0; k < kv; ++k) {
      int64_t rem = k;
      for (int d = ndim - 1; d >= 0; --d) {
        off[d] = (int32_t)(rem % ksize[d]);
        rem /= ksize[d];
      }
      Cand c;
      c.key = 0; c.k = (int32_t)k; c.i = (int32_t)i;
      c.coord[0] = row[0];
      bool ok = true;
      for (int d = 0; d < ndim; ++d) {
        int64_t q;
        if (!transposed) {
          int64_t num = (int64_t)row[d + 1] + padding[d] -
                        (int64_t)off[d] * dilation[d];
          if (num % stride[d] != 0) { ok = false; break; }
          q = num / stride[d];
        } else {
          q = (int64_t)row[d + 1] * stride[d] - padding[d] +
              (int64_t)off[d] * dilation[d];
        }
        if (q < 0 || q >= out_shape[d]) { ok = false; break; }
        c.coord[d + 1] = (int32_t)q;
      }
      if (!ok) continue;
      c.key = linearize(c.coord, out_shape, ndim);
      cands.push_back(c);
    }
  }
  std::sort(cands.begin(), cands.end(),
            [](const Cand& a, const Cand& b) { return a.key < b.key; });

  int32_t n_out = 0;
  int64_t prev_key = -1;
  for (auto& c : cands) {
    int32_t out_row;
    if (c.key != prev_key) {
      if (n_out >= out_cap) break;  // smallest keys kept (bounded mode)
      out_row = n_out++;
      prev_key = c.key;
      std::memcpy(out_indices + (int64_t)out_row * (ndim + 1), c.coord,
                  (ndim + 1) * sizeof(int32_t));
    } else {
      out_row = n_out - 1;
    }
    pair_fwd[(int64_t)c.k * out_cap + out_row] = c.i;
    pair_bwd[(int64_t)c.k * n + c.i] = out_row;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// Point2Voxel (dense-grid CPU voxelizer, pointops.py:493-766 semantics).
// pc: [num_points, num_features] float32 (xyz first).
// Returns num_voxels.
// ---------------------------------------------------------------------------
int32_t spconv_point_to_voxel(
    const float* pc, int64_t num_points, int32_t num_features, int32_t ndim,
    const float* vsize_xyz, const float* coors_range_xyz,
    int64_t max_voxels, int32_t max_points_per_voxel,
    float* voxels, int32_t* coords, int32_t* num_per_voxel,
    int32_t* pc_voxel_id) {
  std::vector<int64_t> grid(ndim);
  for (int d = 0; d < ndim; ++d) {
    grid[d] = (int64_t)std::round(
        (coors_range_xyz[ndim + d] - coors_range_xyz[d]) / vsize_xyz[d]);
  }
  std::unordered_map<int64_t, int32_t> table;
  table.reserve(num_points);
  std::fill(voxels, voxels +
            max_voxels * (int64_t)max_points_per_voxel * num_features, 0.f);
  std::fill(coords, coords + max_voxels * ndim, -1);
  std::fill(num_per_voxel, num_per_voxel + max_voxels, 0);

  int32_t n_vox = 0;
  std::vector<int32_t> vc(ndim);
  for (int64_t p = 0; p < num_points; ++p) {
    const float* pt = pc + p * num_features;
    pc_voxel_id[p] = -1;
    bool ok = true;
    for (int d = 0; d < ndim; ++d) {
      float x = pt[d];
      if (x < coors_range_xyz[d] || x >= coors_range_xyz[ndim + d]) {
        ok = false; break;
      }
      int64_t v = (int64_t)std::floor((x - coors_range_xyz[d]) / vsize_xyz[d]);
      if (v < 0 || v >= grid[d]) { ok = false; break; }
      vc[d] = (int32_t)v;
    }
    if (!ok) continue;
    // key in reversed (ZYX) order to match reference output convention
    int64_t key = 0;
    for (int d = ndim - 1; d >= 0; --d) key = key * grid[d] + vc[d];
    auto it = table.find(key);
    int32_t vid;
    if (it == table.end()) {
      if (n_vox >= max_voxels) continue;  // drop overflow voxels
      vid = n_vox++;
      table.emplace(key, vid);
      for (int d = 0; d < ndim; ++d) coords[vid * ndim + d] = vc[ndim - 1 - d];
    } else {
      vid = it->second;
    }
    pc_voxel_id[p] = vid;
    int32_t& cnt = num_per_voxel[vid];
    if (cnt < max_points_per_voxel) {
      std::memcpy(voxels + ((int64_t)vid * max_points_per_voxel + cnt) *
                               num_features,
                  pt, num_features * sizeof(float));
      ++cnt;
    }
  }
  return n_vox;
}

// ---------------------------------------------------------------------------
// Gather / scatter-add (gather.py parity) for the CPU compute path.
// ---------------------------------------------------------------------------
void spconv_gather(const float* features, const int32_t* inds, int64_t m,
                   int64_t c, float* out) {
  for (int64_t i = 0; i < m; ++i) {
    int32_t src = inds[i];
    if (src < 0) {
      std::memset(out + i * c, 0, c * sizeof(float));
    } else {
      std::memcpy(out + i * c, features + (int64_t)src * c,
                  c * sizeof(float));
    }
  }
}

void spconv_scatter_add(const float* buffer, const int32_t* inds, int64_t m,
                        int64_t c, float* out) {
  for (int64_t i = 0; i < m; ++i) {
    int32_t dst = inds[i];
    if (dst < 0) continue;
    const float* src = buffer + i * c;
    float* d = out + (int64_t)dst * c;
    for (int64_t j = 0; j < c; ++j) d[j] += src[j];
  }
}

}  // extern "C"
