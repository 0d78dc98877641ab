// Shim for hwy/contrib/thread_pool/thread_pool.h (absent from the
// TF-vendored Highway headers).  A SERIAL ThreadPool plus the opaque
// pool::Caller handle util/zones.h needs — scheduling stand-ins only
// (same behavior-equivalence argument as shim/util/threading_context.h:
// the parity harnesses compute order-independent results).
#ifndef REF_PARITY_THREAD_POOL_SHIM_H_
#define REF_PARITY_THREAD_POOL_SHIM_H_

#include <stddef.h>
#include <stdint.h>

namespace hwy {

namespace pool {
using Caller = uint32_t;
}  // namespace pool

class ThreadPool {
 public:
  explicit ThreadPool(size_t /*num_threads*/ = 0) {}
  size_t NumWorkers() const { return 1; }

  template <class Func>
  void Run(uint64_t begin, uint64_t end, pool::Caller /*caller*/,
           const Func& func) {
    for (uint64_t task = begin; task < end; ++task) {
      func(task, /*thread=*/size_t{0});
    }
  }
};

}  // namespace hwy

#endif  // REF_PARITY_THREAD_POOL_SHIM_H_
