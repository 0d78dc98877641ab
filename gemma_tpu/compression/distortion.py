"""Distortion statistics for codec quality analysis
(maps compression/distortion.h:34-180).

Vectorized numpy re-design of the same metrics — check all four, each
covers a different aspect (distortion.h:77-80):
  num_exact, num_rounded_to_zero, geomean_value_div_l1 (Shannon-style
  1 + S/N geomean, higher better), weighted_average_l1 (median-distance
  weighted L1, L-infinity-like, lower better).

Python floats are f64, which exceeds the precision of the reference's
TwoSum/CascadedSummation f32 accumulators; `two_sum`/`CascadedSummation`
are still provided (and tested) as the building block for exact-sum
oracles (ops/dot-inl.h's compensated kernels).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def two_sum(a: float, b: float) -> tuple[float, float]:
    """(sum, err) with sum + err == a + b exactly (Knuth/Moller, 6 ops)."""
    s = a + b
    a2 = s - b
    b2 = s - a2
    return s, (a - a2) + (b - b2)


class CascadedSummation:
    """Twice-working-precision accumulator (Rump/Ogita/Oishi Alg. 6.11)."""

    def __init__(self):
        self.sum = 0.0
        self.sum_err = 0.0

    def notify(self, t: float) -> None:
        self.sum, err = two_sum(self.sum, t)
        self.sum_err += err

    def assimilate(self, other: "CascadedSummation") -> None:
        self.notify(other.sum)
        self.sum_err += other.sum_err

    def total(self) -> float:
        return self.sum + self.sum_err


@dataclasses.dataclass
class DistortionStats:
    n: int = 0
    num_exact: int = 0
    num_sign_flip: int = 0
    num_rounded_to_zero: int = 0
    sum_l1: float = 0.0
    sum_l1_rounded: float = 0.0
    sum_log_snr: float = 0.0
    num_snr: int = 0
    _l1: list = dataclasses.field(default_factory=list)

    def notify_array(self, original: np.ndarray, distorted: np.ndarray) -> None:
        original = np.asarray(original, np.float32).reshape(-1)
        distorted = np.asarray(distorted, np.float32).reshape(-1)
        assert original.shape == distorted.shape
        # original == 0 must be exactly representable (distortion.h:86-88).
        assert not np.any((original == 0.0) & (distorted != 0.0))

        l1 = np.abs(original - distorted).astype(np.float64)
        rounded_to_zero = (original != 0.0) & (distorted == 0.0)
        sign_flip = ((original < 0) != (distorted < 0)) & ~rounded_to_zero

        self.n += original.size
        self.num_exact += int(np.count_nonzero(original == distorted))
        self.num_sign_flip += int(np.count_nonzero(sign_flip))
        self.num_rounded_to_zero += int(np.count_nonzero(rounded_to_zero))
        self.sum_l1 += float(l1.sum())
        self.sum_l1_rounded += float(l1[rounded_to_zero].sum())

        nz = l1 != 0.0
        self._l1.extend(l1[nz].astype(np.float32).tolist())
        snr = 1.0 + np.abs(original[nz]).astype(np.float64) / l1[nz]
        self.sum_log_snr += float(np.log(snr).sum())
        self.num_snr += int(np.count_nonzero(nz))

    def assimilate(self, other: "DistortionStats") -> None:
        self.n += other.n
        self.num_exact += other.num_exact
        self.num_sign_flip += other.num_sign_flip
        self.num_rounded_to_zero += other.num_rounded_to_zero
        self.sum_l1 += other.sum_l1
        self.sum_l1_rounded += other.sum_l1_rounded
        self.sum_log_snr += other.sum_log_snr
        self.num_snr += other.num_snr
        self._l1.extend(other._l1)

    def geomean_value_div_l1(self) -> float:
        """Geomean of 1 + S/N over nonzero errors; higher is better."""
        if self.num_snr == 0:
            return 0.0
        return math.exp(self.sum_log_snr / self.num_snr)

    def weighted_average_l1(self) -> float:
        """Median-distance-weighted mean of nonzero L1 errors: behaves like
        L-infinity but includes every difference (distortion.h:155-180)."""
        if not self._l1:
            return 0.0
        l1 = np.asarray(self._l1, np.float64)
        median = float(np.partition(l1, len(l1) // 2)[len(l1) // 2])
        dist = np.abs(l1 - median)
        max_abs = float(dist.max())
        if max_abs == 0.0:
            return median
        # exp(4 * normalized^2) amplification (distortion.h:180-188).
        w = np.exp(4.0 * (dist / max_abs) ** 2)
        return float((l1 * w).sum() / w.sum())

    def summary(self) -> str:
        return (f"n={self.n} exact={self.num_exact} "
                f"sign_flip={self.num_sign_flip} "
                f"round0={self.num_rounded_to_zero} "
                f"sum_l1={self.sum_l1:.4g} "
                f"snr={self.geomean_value_div_l1():.2f} "
                f"wl1={self.weighted_average_l1():.4g}")
