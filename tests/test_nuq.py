"""NUQ codec tests, mirroring compression/nuq_test.cc (property-based)."""

import numpy as np
import pytest

from gemma_tpu.compression import nuq, sfp


def _snr(orig, dec):
    err = np.abs(orig - dec)
    return np.mean(np.abs(orig)) / (np.mean(err) + 1e-12)


def test_packed_end():
    # 144 bytes per full group: 16-byte table + 128 nibble bytes.
    assert nuq.packed_end(256) == 144
    assert nuq.packed_end(512) == 288
    assert nuq.packed_end(300) == 2 * 16 + 150


def test_stream_layout():
    """Table bytes come first in each 144-byte group, indices after."""
    x = np.linspace(-1.0, 1.0, 512).astype(np.float32)
    stream = nuq.encode(x)
    assert stream.shape[0] == 288
    # Each group's first 16 bytes are ascending SFP-coded centers.
    for g in range(2):
        table = sfp.decode(stream[g * 144 : g * 144 + 16])
        assert np.all(np.diff(table) >= 0)


def test_roundtrip_distributions():
    """Flat / plateau / ramp / normal distributions (nuq_test.cc:517-535)."""
    rng = np.random.default_rng(0)
    cases = {
        "flat": np.full(512, 0.25, np.float32),
        "plateau": np.concatenate(
            [np.full(400, 0.5), np.linspace(-1, 1, 112)]
        ).astype(np.float32),
        "ramp": np.linspace(-1.5, 1.5, 512).astype(np.float32),
        "normal": np.clip(rng.normal(0, 0.3, 512), -1.8, 1.8).astype(np.float32),
    }
    for name, x in cases.items():
        dec = nuq.decode(nuq.encode(x), x.shape[0])
        if name == "flat":
            # A single cluster represents a constant exactly (up to SFP).
            assert np.all(np.abs(dec - x) <= 0.0625 * 0.25)
        else:
            assert _snr(x, dec) > 10, name


def test_exactly_16_values():
    """16 or fewer distinct values are represented exactly (up to SFP rounding)."""
    rng = np.random.default_rng(1)
    levels = np.sort(rng.uniform(-1.5, 1.5, 16)).astype(np.float32)
    # SFP-round the levels so the table stores them exactly.
    levels = sfp.decode(sfp.encode(levels))
    x = levels[rng.integers(0, 16, size=256)]
    dec = nuq.decode(nuq.encode(x), 256)
    np.testing.assert_array_equal(dec, x)


def test_remainder_group():
    """num % 256 != 0: the final short group round-trips."""
    rng = np.random.default_rng(2)
    for num in (1, 100, 255, 257, 300, 511):
        x = rng.uniform(-1, 1, num).astype(np.float32)
        stream = nuq.encode(x)
        assert stream.shape[0] == nuq.packed_end(num)
        dec = nuq.decode(stream, num)
        assert dec.shape[0] == num
        assert _snr(x, dec) > 8


def test_optimal_on_small_case():
    """DP clustering must beat/meet a greedy baseline on a known case."""
    # Two tight clusters + outliers: optimal assigns dedicated clusters.
    x = np.concatenate(
        [
            np.full(120, -0.5, np.float32),
            np.full(120, 0.5, np.float32),
            np.array([1.5, -1.5], np.float32),
            np.random.default_rng(3).uniform(-0.1, 0.1, 14).astype(np.float32),
        ]
    )
    dec = nuq.decode(nuq.encode(x), x.shape[0])
    # The two plateaus and both outliers must be near-exact.
    assert np.abs(dec[:240] - x[:240]).max() < 0.01
    assert np.abs(dec[240] - 1.5) < 0.1 and np.abs(dec[241] + 1.5) < 0.1


def test_device_layout_aligned():
    rng = np.random.default_rng(4)
    rows, cols = 4, 512
    x = rng.uniform(-1, 1, (rows, cols)).astype(np.float32)
    stream = nuq.encode(x.reshape(-1))
    tables, codes = nuq.to_device_layout(stream, rows, cols)
    assert tables.shape == (rows, 2, 16)
    assert codes.shape == (rows, cols)
    # Reconstruction must equal the scalar decode path.
    ref = nuq.decode(stream, rows * cols).reshape(rows, cols)
    got = np.take_along_axis(
        tables.reshape(rows, 2, 16),
        codes.reshape(rows, 2, 256).astype(np.int64),
        axis=2,
    ).reshape(rows, cols)
    np.testing.assert_array_equal(got, ref)


def test_device_layout_unaligned():
    rng = np.random.default_rng(5)
    rows, cols = 3, 384  # cols % 256 != 0
    x = rng.uniform(-1, 1, (rows, cols)).astype(np.float32)
    stream = nuq.encode(x.reshape(-1))
    tables, codes = nuq.to_device_layout(stream, rows, cols)
    assert tables.shape == (rows, 2, 16)
    got = np.empty((rows, cols), np.float32)
    for r in range(rows):
        for c in range(cols):
            got[r, c] = tables[r, c // 256, codes[r, c]]
    assert _snr(x, got) > 8


def test_native_stream_matches_numpy_on_partial_groups():
    """The native and numpy encoders must emit identical streams even for
    tensors whose size is not a multiple of 256: the native path clusters
    full groups only and the partial tail goes through _cluster_group on
    exactly the real values in both paths (ADVICE r1)."""
    import unittest.mock as mock

    from gemma_tpu.compression import nuq_native

    if nuq_native.lib() is None:
        pytest.skip("native NUQ encoder unavailable")
    rng = np.random.default_rng(17)
    for n in (255, 300, 511, 513, 777):
        x = rng.normal(0, 0.3, n).astype(np.float32).clip(-1.8, 1.8)
        s_native = nuq.encode(x)
        with mock.patch.object(nuq, "_native_cluster", lambda *a: None):
            s_numpy = nuq.encode(x)
        np.testing.assert_array_equal(s_native, s_numpy)
