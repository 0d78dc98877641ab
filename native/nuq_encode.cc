// Exact 1-D k-means DP for NUQ encoding
// (maps NuqClustering::ClusterExactL2, compression/nuq-inl.h:246-380).
//
// Bit-compatible with BOTH the Python oracle in compression/nuq.py and the
// reference's own baseline-target binary (tests/test_ref_parity.py): payload
// sort keys, truncated values, f32 prefix-sum cost table, f32 DP with
// strict-Lt / keep-previous tie handling — identical streams all three ways.
// Threads fan out over (pre-padded) 256-value groups.
// Must be compiled with -ffp-contract=off (no FMA contraction).

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
  // FloatPayload (nuq-inl.h:58-77): clear the low 8 mantissa bits and OR in
  // the original index, so sorting the keys sorts truncated values with
  // index tie-breaks, and every sum below sees the TRUNCATED value.
  float keys[kGroup];
  for (int i = 0; i < kGroup; ++i) {
    uint32_t b;
    std::memcpy(&b, &vals[i], 4);
    b = (b & ~uint32_t(kGroup - 1)) | uint32_t(i);
    std::memcpy(&keys[i], &b, 4);
  }
  std::sort(keys, keys + kGroup);  // all keys distinct
  int order[kGroup];
  float clean[kGroup];
  for (int i = 0; i < kGroup; ++i) {
    uint32_t b;
    std::memcpy(&b, &keys[i], 4);
    order[i] = int(b & uint32_t(kGroup - 1));
    b &= ~uint32_t(kGroup - 1);
    std::memcpy(&clean[i], &b, 4);
  }

  // Prefix sums: running double, narrowed to f32 per element for the cost
  // table; double kept for centers (ClusterCost, nuq-inl.h:84-101).
  double dcsum[kGroup + 1];
  float csum[kGroup + 1], csum2[kGroup + 1];
  double c = 0.0, c2 = 0.0;
  dcsum[0] = 0.0;
  csum[0] = csum2[0] = 0.0f;
  for (int i = 0; i < kGroup; ++i) {
    c += clean[i];
    c2 += double(clean[i]) * clean[i];
    dcsum[i + 1] = c;
    csum[i + 1] = float(c);
    csum2[i + 1] = float(c2);
  }
  float inv_len[kGroup + 1];
  inv_len[0] = 0.0f;  // never used (len >= 1)
  for (int len = 1; len <= kGroup; ++len) inv_len[len] = 1.0f / float(len);

  // cost(f, l) in f32 with the reference's exact operation order
  // (SumCosts, nuq-inl.h:149-174); separate roundings, no FMA (matches the
  // baseline-target parity harness; compiled with -ffp-contract=off).
  auto cost = [&](int f, int l) -> float {
    const int len = l - f + 1;
    const float sum = csum[l + 1] - csum[f];
    const float sum2 = csum2[l + 1] - csum2[f];
    const float mu = sum * inv_len[len];
    const float two_sum = sum + sum;
    const float t = mu * float(len) - two_sum;
    const float l2 = mu * t + sum2;
    return l2 > 0.0f ? l2 : 0.0f;  // ZeroIfNegative
  };

  // Precompute the full cost table once per group; row f holds cost(f, l).
  static thread_local std::vector<float> cost_tab((size_t)kGroup * kGroup);
  for (int f = 0; f < kGroup; ++f)
    for (int l = f; l < kGroup; ++l)
      cost_tab[(size_t)f * kGroup + l] = cost(f, l);

  // costs[k][l] = min cost of clustering sorted[0..l] into k+1 clusters,
  // f32 accumulation like the reference's AlignedMatrix<float>.
  static thread_local std::vector<float> costs((size_t)kClusters * kGroup);
  static thread_local std::vector<int> argmin((size_t)kClusters * kGroup);
  for (int l = 0; l < kGroup; ++l) {
    costs[l] = cost_tab[l];
    argmin[l] = 0;
  }
  for (int k = 1; k < kClusters; ++k) {
    float* ck = &costs[(size_t)k * kGroup];
    const float* cp = &costs[(size_t)(k - 1) * kGroup];
    int* ak = &argmin[(size_t)k * kGroup];
    const int* ap = &argmin[(size_t)(k - 1) * kGroup];
    for (int l = 0; l < kGroup; ++l) {
      // Running min starts at the k-1 solution; only strictly better
      // candidates replace it (first minimum wins), mirroring the
      // reference's strict-Lt lane update (nuq-inl.h:299-326).
      float best = cp[l];
      int best_f = ap[l];
      for (int f = 1; f <= l; ++f) {
        const float cand = cp[f - 1] + cost_tab[(size_t)f * kGroup + l];
        if (cand < best) {
          best = cand;
          best_f = f;
        }
      }
      ck[l] = best;
      ak[l] = best_f;
    }
  }

  // Backtrack (nuq-inl.h:327-357); centers from the DOUBLE prefix sums.
  uint8_t idx_sorted[kGroup];
  std::memset(idx_sorted, 0, sizeof(idx_sorted));
  for (int i = 0; i < kClusters; ++i) centers[i] = 0.0f;
  int last = kGroup - 1;
  for (int k = kClusters - 1; k >= 0; --k) {
    const int start = argmin[(size_t)k * kGroup + last];
    const double len = last - start + 1;
    centers[k] = (float)((dcsum[last + 1] - dcsum[start]) / len);
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
