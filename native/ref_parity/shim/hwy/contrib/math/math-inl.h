// Shim for hwy/contrib/math/math-inl.h (absent from the TF-vendored
// Highway headers).  Provides the vector transcendentals the reference's
// ops-inl.h uses (Exp, CallExp, Log, Tanh, SinCos) as LANE-WISE libm
// evaluations.
//
// Behavior note (documented divergence): upstream Highway implements
// these as polynomial approximations whose results can differ from libm
// by a few ulps.  The ref_ops parity harness therefore verifies the
// reference's FORMULAS, CONSTANTS, and operation ORDER (the
// CE-load-bearing parts — e.g. Gelu's 0.03567740813636141 coefficient,
// RMSNorm's eps placement, softcap's cap*tanh(x/cap) algebra) against
// gemma_tpu's ops, with a small ulp tolerance absorbing the
// transcendental-implementation difference.  No reference logic is
// transcribed here.
#ifndef REF_PARITY_MATH_SHIM_H_
#define REF_PARITY_MATH_SHIM_H_

#include <stddef.h>

#include <cmath>

#include "hwy/highway.h"

HWY_BEFORE_NAMESPACE();
namespace hwy {
namespace HWY_NAMESPACE {

namespace ref_parity_detail {

template <class D, class V, class Func>
HWY_INLINE V LaneWise1(D d, V v, const Func& f) {
  using T = TFromD<D>;
  const size_t n = Lanes(d);
  HWY_ALIGN T buf[MaxLanes(D())];
  Store(v, d, buf);
  for (size_t i = 0; i < n; ++i) buf[i] = f(buf[i]);
  return Load(d, buf);
}

}  // namespace ref_parity_detail

template <class D, class V>
HWY_INLINE V Exp(D d, V v) {
  return ref_parity_detail::LaneWise1(
      d, v, [](TFromD<D> x) { return std::exp(x); });
}

// Non-inlined variant (upstream: SVE codegen workaround) — same values.
template <class D, class V>
HWY_NOINLINE V CallExp(D d, V v) {
  return Exp(d, v);
}

template <class D, class V>
HWY_INLINE V Log(D d, V v) {
  return ref_parity_detail::LaneWise1(
      d, v, [](TFromD<D> x) { return std::log(x); });
}

template <class D, class V>
HWY_INLINE V Tanh(D d, V v) {
  return ref_parity_detail::LaneWise1(
      d, v, [](TFromD<D> x) { return std::tanh(x); });
}

template <class D, class V>
HWY_INLINE void SinCos(D d, V v, V& sin_out, V& cos_out) {
  sin_out = ref_parity_detail::LaneWise1(
      d, v, [](TFromD<D> x) { return std::sin(x); });
  cos_out = ref_parity_detail::LaneWise1(
      d, v, [](TFromD<D> x) { return std::cos(x); });
}

}  // namespace HWY_NAMESPACE
}  // namespace hwy
HWY_AFTER_NAMESPACE();

#endif  // REF_PARITY_MATH_SHIM_H_
