"""I8 codec tests, mirroring compression/int_test.cc."""

import numpy as np

from gemma_tpu.compression import int8


def test_packed_end():
    assert int8.packed_end(128) == 132
    assert int8.packed_end(256) == 264
    assert int8.packed_end(130) == 2 * 4 + 130


def test_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.0, 1024).astype(np.float32)
    dec = int8.decode(int8.encode(x), 1024)
    # Groupwise asymmetric int8: error bounded by ~range/255 per group
    # plus bf16 rounding of scale/zero-point.
    for g in range(8):
        seg = x[g * 128 : (g + 1) * 128]
        seg_dec = dec[g * 128 : (g + 1) * 128]
        step = (seg.max() - seg.min()) / 255.0
        assert np.abs(seg - seg_dec).max() <= step * 1.6 + 1e-6


def test_constant_group():
    x = np.full(128, 0.75, np.float32)
    dec = int8.decode(int8.encode(x), 128)
    assert np.abs(dec - x).max() < 0.01


def test_remainder():
    rng = np.random.default_rng(1)
    for num in (1, 64, 127, 129, 200, 300):
        x = rng.uniform(-2, 2, num).astype(np.float32)
        stream = int8.encode(x)
        assert stream.shape[0] == int8.packed_end(num)
        dec = int8.decode(stream, num)
        assert dec.shape[0] == num
        assert np.abs(dec - x).max() < 0.05


def test_device_layout():
    rng = np.random.default_rng(2)
    rows, cols = 4, 256
    x = rng.normal(0, 1, (rows, cols)).astype(np.float32)
    stream = int8.encode(x.reshape(-1))
    codes, inv_scales, zp = int8.to_device_layout(stream, rows, cols)
    assert codes.shape == (rows, cols)
    assert inv_scales.shape == (rows, 2)
    got = inv_scales.repeat(128, axis=1) * (
        codes.astype(np.float32) - zp.repeat(128, axis=1)
    )
    ref = int8.decode(stream, rows * cols).reshape(rows, cols)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_registry_dispatch():
    from gemma_tpu.compression import Type, compress, decompress, compress_tensor

    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.5, (8, 256)).astype(np.float32)
    for t in (Type.F32, Type.BF16, Type.SFP, Type.NUQ, Type.I8):
        pt = compress_tensor(t, "w", x)
        dec = pt.to_f32()
        assert dec.shape == x.shape
        err = np.abs(dec - x).max()
        assert err < {Type.F32: 1e-7, Type.BF16: 0.01, Type.SFP: 0.08,
                      Type.NUQ: 0.5, Type.I8: 0.05}[t], t


def test_scale_applied_for_out_of_range():
    from gemma_tpu.compression import Type, compress_tensor

    rng = np.random.default_rng(4)
    x = (rng.normal(0, 4.0, (4, 256))).astype(np.float32)
    pt = compress_tensor(Type.SFP, "w", x)
    assert pt.scale > 1.0
    rel = np.abs(pt.to_f32() - x) / (np.abs(x) + 1e-3)
    assert np.median(rel) < 0.05
