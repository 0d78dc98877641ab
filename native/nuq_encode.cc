// Exact 1-D k-means DP for NUQ encoding
// (maps NuqClustering::ClusterExactL2, compression/nuq-inl.h:246-380).
//
// Bit-compatible with the Python reference in compression/nuq.py: same
// f64 prefix-sum cost formula, same first-minimum/keep-previous tie
// handling, so native and Python encodes produce identical streams.
// Threads fan out over (pre-padded) 256-value groups.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kGroup = 256;
constexpr int kClusters = 16;

void ClusterGroup(const float* vals, float* centers, uint8_t* indices) {
  // Sort with stable order (values are distinct enough that stability only
  // matters for exact ties; std::stable_sort on index pairs matches
  // np.argsort(kind="stable")).
  int order[kGroup];
  for (int i = 0; i < kGroup; ++i) order[i] = i;
  std::stable_sort(order, order + kGroup, [&](int a, int b) {
    return vals[a] < vals[b];
  });
  double sorted[kGroup];
  for (int i = 0; i < kGroup; ++i) sorted[i] = vals[order[i]];

  double csum[kGroup + 1], csum2[kGroup + 1];
  csum[0] = csum2[0] = 0.0;
  for (int i = 0; i < kGroup; ++i) {
    csum[i + 1] = csum[i] + sorted[i];
    csum2[i + 1] = csum2[i] + sorted[i] * sorted[i];
  }
  // cost(f, l) for f <= l (one cluster over sorted[f..l]).
  auto cost = [&](int f, int l) -> double {
    const double len = l - f + 1;
    const double seg_sum = csum[l + 1] - csum[f];
    const double seg_sum2 = csum2[l + 1] - csum2[f];
    const double mu = seg_sum / len;
    const double c = seg_sum2 - mu * (2.0 * seg_sum - mu * len);
    return c > 0.0 ? c : 0.0;
  };

  // Precompute the full cost table once per group (reused by all layers);
  // row f holds cost(f, l) for l in [0, kGroup).
  static thread_local std::vector<double> cost_tab((size_t)kGroup * kGroup);
  for (int f = 0; f < kGroup; ++f)
    for (int l = f; l < kGroup; ++l) cost_tab[(size_t)f * kGroup + l] = cost(f, l);

  static thread_local std::vector<double> costs((size_t)kClusters * kGroup);
  static thread_local std::vector<int> argmin((size_t)kClusters * kGroup);
  for (int l = 0; l < kGroup; ++l) {
    costs[l] = cost_tab[l];
    argmin[l] = 0;
  }
  for (int k = 1; k < kClusters; ++k) {
    double* ck = &costs[(size_t)k * kGroup];
    const double* cp = &costs[(size_t)(k - 1) * kGroup];
    int* ak = &argmin[(size_t)k * kGroup];
    const int* ap = &argmin[(size_t)(k - 1) * kGroup];
    for (int l = 0; l < kGroup; ++l) {
      // best over f in [1, l] of cp[f-1] + cost(f, l); first minimum wins.
      double best = std::numeric_limits<double>::infinity();
      int best_f = 0;
      for (int f = 1; f <= l; ++f) {
        const double c = cp[f - 1] + cost_tab[(size_t)f * kGroup + l];
        if (c < best) {
          best = c;
          best_f = f;
        }
      }
      // keep previous layer on ties (costs[k-1] <= best).
      if (cp[l] <= best) {
        ck[l] = cp[l];
        ak[l] = ap[l];
      } else {
        ck[l] = best;
        ak[l] = best_f;
      }
    }
  }

  // Backtrack (nuq-inl.h:327-357).
  uint8_t idx_sorted[kGroup];
  std::memset(idx_sorted, 0, sizeof(idx_sorted));
  for (int i = 0; i < kClusters; ++i) centers[i] = 0.0f;
  int last = kGroup - 1;
  for (int k = kClusters - 1; k >= 0; --k) {
    const int start = argmin[(size_t)k * kGroup + last];
    const double len = last - start + 1;
    centers[k] = (float)((csum[last + 1] - csum[start]) / len);
    for (int i = start; i <= last; ++i) idx_sorted[i] = (uint8_t)k;
    if (start == 0) break;
    last = start - 1;
  }
  for (int i = 0; i < kGroup; ++i) indices[order[i]] = idx_sorted[i];
}

}  // namespace

extern "C" {

// values: [num_groups * 256] f32 (caller pads the final group).
// centers_out: [num_groups * 16] f32; indices_out: [num_groups * 256] u8.
__attribute__((visibility("default"))) void gemma_nuq_cluster(
    const float* values, uint64_t num_groups, float* centers_out,
    uint8_t* indices_out, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<uint64_t> next{0};
  auto worker = [&]() {
    for (;;) {
      const uint64_t g = next.fetch_add(1);
      if (g >= num_groups) break;
      ClusterGroup(values + g * kGroup, centers_out + g * kClusters,
                   indices_out + g * kGroup);
    }
  };
  std::vector<std::thread> pool;
  const int n = (int)std::min<uint64_t>(threads, num_groups);
  for (int t = 0; t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
