"""Auxiliary subsystems: profiler zones, distortion stats, show_config."""

import math

import numpy as np
import pytest

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.compression.distortion import (
    CascadedSummation,
    DistortionStats,
    two_sum,
)
from gemma_tpu.utils import profiler


def test_two_sum_exact():
    s, err = two_sum(1e16, 1.0)
    assert s == 1e16  # 1.0 lost in the sum...
    assert err == 1.0  # ...but recovered exactly


def test_cascaded_summation():
    cs = CascadedSummation()
    for _ in range(1000):
        cs.notify(0.1)
    naive = sum([0.1] * 1000)
    assert abs(cs.total() - 100.0) <= abs(naive - 100.0)

    other = CascadedSummation()
    other.notify(1e-9)
    cs.assimilate(other)
    assert cs.total() == pytest.approx(100.0 + 1e-9, abs=1e-12)


def test_distortion_stats_sfp():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.4, (64, 128)).astype(np.float32)
    x[0, :8] = 0.0  # exact zeros stay exact
    pt = compress_tensor(Type.SFP, "w", x)
    decoded = pt.to_f32()

    stats = DistortionStats()
    stats.notify_array(x, decoded)
    assert stats.n == x.size
    assert stats.num_exact >= 8  # at least the zeros
    assert stats.num_sign_flip == 0
    # SFP keeps >= 2 mantissa bits: SNR (1 + |x|/err geomean) well above 8.
    assert stats.geomean_value_div_l1() > 8.0
    assert 0.0 < stats.weighted_average_l1() < 0.1
    assert "exact=" in stats.summary()

    # assimilate: two halves == whole
    s1, s2 = DistortionStats(), DistortionStats()
    s1.notify_array(x[:32], decoded[:32])
    s2.notify_array(x[32:], decoded[32:])
    s1.assimilate(s2)
    assert s1.n == stats.n
    assert s1.num_exact == stats.num_exact
    assert s1.geomean_value_div_l1() == pytest.approx(
        stats.geomean_value_div_l1(), rel=1e-9)


def test_profiler_zones(capsys):
    profiler.reset()
    with profiler.zone("Test.outer"):
        with profiler.zone("Test.inner"):
            pass
    with profiler.zone("Test.inner"):
        pass
    res = profiler.results()
    assert res["Test.inner"][1] == 2
    assert res["Test.outer"][1] == 1
    assert res["Test.outer"][0] >= res["Test.inner"][0] / 2
    profiler.print_results()
    out = capsys.readouterr().out
    assert "Test.inner" in out and "Zone" in out
    assert not profiler.results()  # reset after print

    profiler.enable(False)
    with profiler.zone("Test.disabled"):
        pass
    assert not profiler.results()
    profiler.enable(True)


def test_show_config(capsys, tmp_path):
    from gemma_tpu.evals.benchmark_helper import show_config
    from gemma_tpu.gemma import Gemma
    from tests.test_frontends import tiny_model_file

    g = Gemma.load(tiny_model_file(tmp_path))
    show_config(g)
    out = capsys.readouterr().out
    assert "tiny-test" in out and "Devices" in out


def test_analyze_tensor():
    from gemma_tpu.compression import Type
    from gemma_tpu.compression.analyze import analyze_tensor

    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, (32, 64)).astype(np.float32)
    out = analyze_tensor("w", x, codec=Type.SFP)
    assert "shape=(32, 64)" in out and "distortion" in out
