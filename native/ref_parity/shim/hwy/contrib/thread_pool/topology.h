// Shim for hwy/contrib/thread_pool/topology.h (absent from the TF-vendored
// Highway headers).  Provides just enough of the public hwy topology API for
// the reference's util/topology.h to TYPECHECK when compiled with
// -DGEMMA_DISABLE_TOPOLOGY=1 (which drops the hwy::Topology member).  The
// harness never constructs BoundedTopology, and links with --gc-sections,
// so none of this runs.
#ifndef REF_PARITY_TOPOLOGY_SHIM_H_
#define REF_PARITY_TOPOLOGY_SHIM_H_

#include <stddef.h>
#include <stdint.h>

#include <vector>

namespace hwy {

class LogicalProcessorSet {
 public:
  static constexpr size_t kMaxLPs = 4096;

  void Set(size_t lp) { bits_[lp / 64] |= (1ull << (lp % 64)); }
  void Clear(size_t lp) { bits_[lp / 64] &= ~(1ull << (lp % 64)); }
  bool Get(size_t lp) const { return (bits_[lp / 64] >> (lp % 64)) & 1; }

  size_t Count() const {
    size_t n = 0;
    for (uint64_t w : bits_) n += static_cast<size_t>(__builtin_popcountll(w));
    return n;
  }
  bool Any() const {
    for (uint64_t w : bits_) {
      if (w) return true;
    }
    return false;
  }
  size_t First() const {
    for (size_t i = 0; i < kMaxLPs / 64; ++i) {
      if (bits_[i]) {
        return i * 64 + static_cast<size_t>(__builtin_ctzll(bits_[i]));
      }
    }
    return 0;
  }

  template <class Func>
  void Foreach(const Func& func) const {
    for (size_t i = 0; i < kMaxLPs / 64; ++i) {
      uint64_t w = bits_[i];
      while (w) {
        const size_t bit = static_cast<size_t>(__builtin_ctzll(w));
        func(i * 64 + bit);
        w &= w - 1;
      }
    }
  }

 private:
  uint64_t bits_[kMaxLPs / 64] = {};
};

inline bool GetThreadAffinity(LogicalProcessorSet& lps) {
  lps.Set(0);
  return false;  // "unknown" — never called by the parity harness anyway.
}

inline size_t TotalLogicalProcessors() { return 1; }

struct Topology {
  struct LP {
    size_t cluster = 0;
    size_t core = 0;
    size_t smt = 0;
    size_t node = 0;
  };
  struct Cluster {
    LogicalProcessorSet lps;
    size_t private_kib = 0;
    size_t shared_kib = 0;
  };
  struct Core {
    LogicalProcessorSet lps;
  };
  struct Package {
    std::vector<Cluster> clusters;
    std::vector<Core> cores;
  };
  std::vector<Package> packages;
  std::vector<LP> lps;
};

}  // namespace hwy

#endif  // REF_PARITY_TOPOLOGY_SHIM_H_
