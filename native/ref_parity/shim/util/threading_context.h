// Shim for util/threading_context.h: a SERIAL stand-in for the reference's
// thread-pool plumbing, used when compiling the reference's io/blob_store.cc
// into the ref_blob parity harness (tests/test_ref_parity.py).
//
// Behavior-equivalence argument: BlobWriter uses ThreadingContext solely to
// parallelize independent pwrite()s of disjoint file ranges
// (io/blob_store.cc:481-507) — the on-disk bytes are a pure function of the
// (range, data) pairs, not of write order or thread count, so a serial loop
// produces a byte-identical file.  None of the reference's FORMAT logic
// (header/directory/padding layout) is shimmed; that all comes from
// blob_store.cc itself.
#ifndef REF_PARITY_THREADING_CONTEXT_SHIM_H_
#define REF_PARITY_THREADING_CONTEXT_SHIM_H_

#include <stddef.h>
#include <stdint.h>

#include "hwy/contrib/thread_pool/thread_pool.h"

// The REAL zones.h (from the reference tree): the full Zones/Callers
// enums + ProfilerZones/PoolCallers — header-only against the profiler
// and thread_pool shims; their ctors live in zones.cc, which is never
// linked and never odr-used here.
#include "util/zones.h"

namespace gcpp {

enum class ParallelismStrategy : uint8_t {
  kNone,
  kAcrossClusters,
  kWithinCluster,
  kFlat,
  kHierarchical,
};

// Serial stand-ins for the pool plumbing header-only reference code
// touches (compress-inl.h:540 uses ctx.pools.Pool() + pool_callers).
struct ShimPools {
  hwy::ThreadPool& Pool() { return pool_; }
  hwy::ThreadPool& Cluster(size_t) { return pool_; }
  hwy::ThreadPool& AllClusters() { return pool_; }
  size_t MaxWorkersPerCluster() const { return 1; }
  hwy::ThreadPool pool_;
};

struct ShimPoolCallers {
  hwy::pool::Caller Get(Callers) const { return 0; }
};

struct ThreadingContext {
  size_t Worker(size_t) const { return 0; }
  ShimPools pools;
  ShimPoolCallers pool_callers;
};

// Serial ParallelFor: same tasks, same worker index, one at a time.
template <class Func>
void ParallelFor(ParallelismStrategy /*parallelism*/, size_t num_tasks,
                 ThreadingContext& /*ctx*/, size_t /*cluster_idx*/,
                 Callers /*callers*/, const Func& func) {
  for (size_t task = 0; task < num_tasks; ++task) {
    func(task, /*worker=*/0);
  }
}

#define GCPP_ZONE(ctx, global_idx, zone_enum)

}  // namespace gcpp

#endif  // REF_PARITY_THREADING_CONTEXT_SHIM_H_
