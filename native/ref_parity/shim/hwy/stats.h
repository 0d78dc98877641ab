// Shim for hwy/stats.h (absent from the TF-vendored Highway headers):
// a minimal running-stats accumulator with the API surface the
// reference's compression/distortion.h touches (Notify/Assimilate +
// min/max/mean accessors).  Diagnostics only — never on a parity path.
#ifndef REF_PARITY_STATS_SHIM_H_
#define REF_PARITY_STATS_SHIM_H_

#include <stddef.h>

#include <cmath>
#include <limits>

namespace hwy {

class Stats {
 public:
  Stats() = default;

  void Notify(float x) {
    ++n_;
    sum_ += x;
    sum2_ += static_cast<double>(x) * x;
    if (x < min_) min_ = x;
    if (x > max_) max_ = x;
  }

  void Assimilate(const Stats& o) {
    n_ += o.n_;
    sum_ += o.sum_;
    sum2_ += o.sum2_;
    if (o.min_ < min_) min_ = o.min_;
    if (o.max_ > max_) max_ = o.max_;
  }

  size_t Count() const { return n_; }
  float Min() const { return min_; }
  float Max() const { return max_; }
  double Sum() const { return sum_; }
  double Mean() const { return n_ ? sum_ / n_ : 0.0; }
  double StandardDeviation() const {
    if (n_ == 0) return 0.0;
    const double m = Mean();
    const double var = sum2_ / n_ - m * m;
    return var > 0.0 ? std::sqrt(var) : 0.0;
  }
  double GeometricMean() const { return 0.0; }  // unused by the harness

 private:
  size_t n_ = 0;
  double sum_ = 0.0;
  double sum2_ = 0.0;
  float min_ = std::numeric_limits<float>::max();
  float max_ = std::numeric_limits<float>::lowest();
};

}  // namespace hwy

#endif  // REF_PARITY_STATS_SHIM_H_
