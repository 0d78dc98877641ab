// Shim for ops/matmul_static.h in the ref_ops parity harness: the real
// header declares per-target MatMulStatic dispatch entry points backed by
// five .cc TUs the harness never calls (their call sites in ops-inl.h are
// dependent expressions inside never-instantiated templates).
#ifndef REF_PARITY_OPS_MATMUL_STATIC_SHIM_H_
#define REF_PARITY_OPS_MATMUL_STATIC_SHIM_H_

#include "ops/matmul.h"
#include "util/basics.h"  // BF16
#include "util/mat.h"     // MatPtrT
#include "hwy/highway.h"

// Declarations only: ops-inl.h's CallMatMul/CallTwoMatMul helpers
// instantiate generic lambdas that NAME these; the harness never calls
// them, so the (gc-sections-dropped) call sites never need definitions.
HWY_BEFORE_NAMESPACE();
namespace gcpp {
namespace HWY_NAMESPACE {

template <typename TA, typename TB, typename TC>
MMPerKey* MatMulStatic(const MatPtrT<TA>& A, const MatPtrT<TB>& B,
                       const float* add, MatMulEnv& env, MatPtrT<TC>& C,
                       const MMOptions& options);

template <typename TB>
void TwoMatMulStatic(const MatPtrT<BF16>& A, const MatPtrT<TB>& B1,
                     const MatPtrT<TB>& B2, MatMulEnv& env,
                     MatPtrT<BF16>& C, const MMOptions& options);

}  // namespace HWY_NAMESPACE
}  // namespace gcpp
HWY_AFTER_NAMESPACE();

#endif  // REF_PARITY_OPS_MATMUL_STATIC_SHIM_H_
