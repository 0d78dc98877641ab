// Shim for hwy/contrib/sort/vqsort-inl.h (absent from the only Highway
// headers available in this environment — TensorFlow vendors hwy without
// contrib/).  The reference's NUQ encoder (compression/nuq-inl.h:273) sorts
// floats whose low mantissa bits carry UNIQUE original indices, so all keys
// are distinct and every comparison sort produces the identical permutation
// VQSortStatic would — std::sort is behavior-equivalent for this use.
#ifndef REF_PARITY_VQSORT_INL_SHIM_H_
#define REF_PARITY_VQSORT_INL_SHIM_H_

#include <stddef.h>

#include <algorithm>
#include <functional>

#include "hwy/highway.h"
#include "hwy/contrib/sort/order.h"

namespace hwy {
namespace HWY_NAMESPACE {

template <typename T>
void VQSortStatic(T* HWY_RESTRICT keys, size_t num, hwy::SortAscending) {
  std::sort(keys, keys + num);
}

template <typename T>
void VQSortStatic(T* HWY_RESTRICT keys, size_t num, hwy::SortDescending) {
  std::sort(keys, keys + num, std::greater<T>());
}

}  // namespace HWY_NAMESPACE
}  // namespace hwy

#endif  // REF_PARITY_VQSORT_INL_SHIM_H_
