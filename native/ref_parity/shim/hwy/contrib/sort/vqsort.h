// Shim for hwy/contrib/sort/vqsort.h (absent from the TF-vendored Highway
// headers).  std::sort / std::nth_element stand-ins; the reference's only
// use in the compiled harnesses sorts doubles whose packed low bits carry
// UNIQUE token ids (ops-inl.h:1340-1358), so all keys are distinct and any
// comparison sort yields the identical permutation (same argument as
// shim/hwy/contrib/sort/vqsort-inl.h).
#ifndef REF_PARITY_VQSORT_SHIM_H_
#define REF_PARITY_VQSORT_SHIM_H_

#include <stddef.h>

#include <algorithm>
#include <functional>

#include "hwy/contrib/sort/order.h"

namespace hwy {

template <typename T>
inline void VQSort(T* keys, size_t n, SortAscending) {
  std::sort(keys, keys + n);
}

template <typename T>
inline void VQSort(T* keys, size_t n, SortDescending) {
  std::sort(keys, keys + n, std::greater<T>());
}

template <typename T>
inline void VQSelect(T* keys, size_t n, size_t k, SortAscending) {
  if (k < n) std::nth_element(keys, keys + k, keys + n);
}

template <typename T>
inline void VQSelect(T* keys, size_t n, size_t k, SortDescending) {
  if (k < n) std::nth_element(keys, keys + k, keys + n, std::greater<T>());
}

}  // namespace hwy

#endif  // REF_PARITY_VQSORT_SHIM_H_
