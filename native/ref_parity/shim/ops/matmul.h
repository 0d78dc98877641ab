// Shim for ops/matmul.h when compiling the reference's ops-inl.h into the
// ref_ops parity harness: the REAL matmul.h's inline bodies drive
// NestedPools/cluster scheduling the harness neither needs nor links.
// ops-inl.h's only direct uses are in the template/generic-lambda
// CallMatMul / CallTwoMatMul helpers, whose MatMulStatic calls are
// dependent (resolved only on instantiation — never instantiated here),
// so opaque declarations + an empty-options stand-in suffice.
#ifndef REF_PARITY_OPS_MATMUL_SHIM_H_
#define REF_PARITY_OPS_MATMUL_SHIM_H_

#include "util/mat.h"
#include "util/threading_context.h"

namespace gcpp {

struct MMPerKey;
class MatMulEnv;
struct MMOptions {};

}  // namespace gcpp

#endif  // REF_PARITY_OPS_MATMUL_SHIM_H_
