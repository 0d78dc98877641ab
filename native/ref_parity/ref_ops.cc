// Weights-free numeric-parity oracle for the CE-LOAD-BEARING elementwise
// ops: drives the REFERENCE's own ops-inl.h functions, compiled directly
// from the read-only tree (ops/ops-inl.h:127-1300 — Gelu constants,
// RMSNorm's (1+w) FMA and 1e-6 eps placement, Rope's split-halves
// rotation and mul ordering, Softmax's max-subtract/exp/exact-sum/
// reciprocal order, LogitsSoftCap's cap*tanh(x/cap)), so gemma_tpu's
// ops/ops.py can be ULP-compared against the original C++ (VERDICT r4 #4).
//
// This file contains NO transcribed reference logic — it only calls the
// reference's functions and marshals f32 arrays across stdin/stdout:
//
//   ref_ops gelu <n>              stdin: x[n]            stdout: gelu(x)[n]
//   ref_ops rmsnorm <n>           stdin: x[n], w[n]      stdout: out[n]
//   ref_ops rope <dim> <pos>      stdin: x[dim], its[dim/2]   stdout: x[dim]
//   ref_ops ropemul <dim> <pos> <mul>  (same, RopeAndMulBy)
//   ref_ops softmax <n>           stdin: logits[n]       stdout: probs[n]
//   ref_ops softcap <n> <cap>     stdin: logits[n]       stdout: capped[n]
//
// Built by build.sh with the lane-wise-libm math shim (see
// shim/hwy/contrib/math/math-inl.h for the documented transcendental
// divergence) and the serial threading shims.
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <string>
#include <vector>

#include "hwy/highway.h"
#include "ops/ops-inl.h"

namespace {

std::vector<float> ReadF32(size_t n) {
  std::vector<float> buf(n);
  if (fread(buf.data(), sizeof(float), n, stdin) != n) {
    fprintf(stderr, "ref_ops: expected %zu f32 on stdin\n", n);
    exit(2);
  }
  return buf;
}

void WriteF32(const float* p, size_t n) {
  if (fwrite(p, sizeof(float), n, stdout) != n) exit(2);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: ref_ops {gelu|rmsnorm|rope|ropemul|softmax|softcap}"
            " <n> [args]\n");
    return 2;
  }
  const std::string mode = argv[1];
  const size_t n = static_cast<size_t>(strtoull(argv[2], nullptr, 10));
  gcpp::ThreadingContext ctx;
  namespace ops = gcpp::HWY_NAMESPACE;

  if (mode == "gelu") {
    std::vector<float> x = ReadF32(n);
    ops::Gelu(x.data(), n);
    WriteF32(x.data(), n);
    return 0;
  }
  if (mode == "rmsnorm") {
    std::vector<float> x = ReadF32(n);
    std::vector<float> w = ReadF32(n);
    std::vector<float> out(n);
    ops::RMSNorm(x.data(), w.data(), /*w_ofs=*/0, out.data(), n, ctx,
                 /*worker=*/0);
    WriteF32(out.data(), n);
    return 0;
  }
  if (mode == "rope" || mode == "ropemul") {
    const int pos = atoi(argv[3]);
    std::vector<float> x = ReadF32(n);
    std::vector<float> its = ReadF32(n / 2);
    if (mode == "rope") {
      ops::Rope(x.data(), n, its.data(), pos, ctx, 0);
    } else {
      const float mul = strtof(argv[4], nullptr);
      ops::RopeAndMulBy(mul, x.data(), n, its.data(), pos, ctx, 0);
    }
    WriteF32(x.data(), n);
    return 0;
  }
  if (mode == "softmax") {
    std::vector<float> x = ReadF32(n);
    ops::Softmax(gcpp::Logits(x.data(), n), ctx, /*worker=*/0);
    WriteF32(x.data(), n);
    return 0;
  }
  if (mode == "softcap") {
    const float cap = strtof(argv[3], nullptr);
    std::vector<float> x = ReadF32(n);
    ops::LogitsSoftCap(cap, gcpp::Logits(x.data(), n), ctx, /*worker=*/0);
    WriteF32(x.data(), n);
    return 0;
  }
  fprintf(stderr, "ref_ops: unknown mode %s\n", mode.c_str());
  return 2;
}
