// Shim for hwy/contrib/sort/order.h (absent from the TF-vendored Highway
// headers): the sort-order tag types only.
#ifndef REF_PARITY_SORT_ORDER_SHIM_H_
#define REF_PARITY_SORT_ORDER_SHIM_H_

namespace hwy {

struct SortAscending {};
struct SortDescending {};

}  // namespace hwy

#endif  // REF_PARITY_SORT_ORDER_SHIM_H_
