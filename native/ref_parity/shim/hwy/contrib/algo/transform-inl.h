// Shim for hwy/contrib/algo/transform-inl.h (absent from the TF-vendored
// Highway headers).  Provides Foreach / Transform with upstream's
// semantics: whole vectors over the aligned prefix, then one padded tail
// vector (tail lanes filled from `pad` for Foreach; Transform writes back
// only the valid tail lanes).  Pure iteration scaffolding — no reference
// logic.
#ifndef REF_PARITY_TRANSFORM_SHIM_H_
#define REF_PARITY_TRANSFORM_SHIM_H_

#include <stddef.h>

#include "hwy/highway.h"

HWY_BEFORE_NAMESPACE();
namespace hwy {
namespace HWY_NAMESPACE {

// func(d, v) is called for every element exactly once; tail lanes are
// padded with `pad_value` so reductions (e.g. running max) are unaffected.
template <class D, typename T, class Func>
HWY_INLINE void Foreach(D d, const T* HWY_RESTRICT p, size_t count,
                        Vec<D> pad_value, const Func& func) {
  const size_t N = Lanes(d);
  size_t i = 0;
  for (; i + N <= count; i += N) {
    func(d, LoadU(d, p + i));
  }
  if (i != count) {
    const size_t remaining = count - i;
    const Vec<D> v = LoadNOr(pad_value, d, p + i, remaining);
    func(d, v);
  }
}

// In-place elementwise: p[i] = func(d, p[i]).
template <class D, typename T, class Func>
HWY_INLINE void Transform(D d, T* HWY_RESTRICT p, size_t count,
                          const Func& func) {
  const size_t N = Lanes(d);
  size_t i = 0;
  for (; i + N <= count; i += N) {
    StoreU(func(d, LoadU(d, p + i)), d, p + i);
  }
  if (i != count) {
    const size_t remaining = count - i;
    const Vec<D> v = LoadN(d, p + i, remaining);
    StoreN(func(d, v), d, p + i, remaining);
  }
}

}  // namespace HWY_NAMESPACE
}  // namespace hwy
HWY_AFTER_NAMESPACE();

#endif  // REF_PARITY_TRANSFORM_SHIM_H_
