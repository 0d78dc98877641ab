// Shim for hwy/bit_set.h (absent from the TF-vendored Highway headers).
// Minimal BitSet4096 (Get/Set over u64 words) — the reference's ops-inl.h
// only touches Get/Set on it in paths the ref_ops harness never runs.
#ifndef REF_PARITY_BIT_SET_SHIM_H_
#define REF_PARITY_BIT_SET_SHIM_H_

#include <stddef.h>
#include <stdint.h>

namespace hwy {

template <size_t kMaxSize = 4096>
class BitSet4096 {
 public:
  BitSet4096() {
    for (size_t i = 0; i < kWords; ++i) bits_[i] = 0;
  }
  void Set(size_t i) { bits_[i / 64] |= uint64_t{1} << (i % 64); }
  void Clear(size_t i) { bits_[i / 64] &= ~(uint64_t{1} << (i % 64)); }
  bool Get(size_t i) const {
    return (bits_[i / 64] >> (i % 64)) & 1;
  }

 private:
  static constexpr size_t kWords = kMaxSize / 64;
  uint64_t bits_[kWords];
};

}  // namespace hwy

#endif  // REF_PARITY_BIT_SET_SHIM_H_
