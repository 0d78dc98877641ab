"""SFP codec tests, mirroring compression/sfp_test.cc."""

import numpy as np
import pytest

from gemma_tpu.compression import sfp
from gemma_tpu.utils.basics import bf16_bits_to_f32, f32_to_bf16_truncate

# Golden (input, decoded) pairs from compression/sfp_test.cc:223-262.
GOLDEN = [
    (0.46875, 0.46875),
    (0.9375, 0.9375),
    (0.484375, 0.5),
    (0.96875, 1.0),
    (0.28125, 0.28125),
    (0.5625, 0.5625),
    (0.296875, 0.3125),
    (0.59375, 0.625),
    (0.279296875, 0.28125),
    (0.55859375, 0.5625),
    (0.265625, 0.25),
    (0.53125, 0.5),
    (0.0068359375, 0.0068359375),
    (0.00732421875, 0.0078125),
    (0.007568359375, 0.0078125),
    (1.0, 1.0),
    (1.0625, 1.0),
    (2.384185791015625e-7, 2.384185791015625e-7),
    (1.49011611938e-07, 1.49011611938e-07),
    (1.19209289551e-07, 1.49011611938e-07),
    (5.96046447754e-08, 0.0),
    (8.94069671631e-08, 0.0),
    (1.11758708954e-07, 1.49011611938e-07),
    (0.013841, 0.013671875),
]


def test_golden():
    for in_v, out_v in GOLDEN:
        for s in (1.0, -1.0):
            enc = sfp.encode(np.array([s * in_v], np.float32))
            dec = sfp.decode(enc)[0]
            assert dec == np.float32(s * out_v) or (out_v == 0.0 and dec == 0.0), (
                in_v,
                s,
                dec,
                out_v,
            )


def test_all_codes_unique_and_roundtrip():
    """Every valid byte decodes to a distinct value that re-encodes to itself.

    Mirrors sfp_test TestAllUnique/TestAllDecEnc: codes 0x00..0xFF except
    0x80 (reserved -0).
    """
    codes = np.array([c for c in range(256) if c != 0x80], np.uint8)
    decoded = sfp.decode(codes)
    assert len(np.unique(decoded)) == len(codes)
    re_encoded = sfp.encode(decoded)
    np.testing.assert_array_equal(re_encoded, codes)


def test_decode_formula():
    """Check the closed-form decode against hand-computed cases."""
    # v=1 (small): 0x3400 + 32 = 0x3420 -> 1.0p-23 * 1.25 = 1.49e-07.
    assert sfp.decode(np.array([1], np.uint8))[0] == np.float32(1.49011611938e-07)
    # v=64 (large): 0x3800 + 0x400 = 0x3C00 -> 0.0078125.
    assert sfp.decode(np.array([64], np.uint8))[0] == np.float32(0.0078125)
    # 0x7F: max = 1.875.
    assert sfp.decode(np.array([0x7F], np.uint8))[0] == np.float32(1.875)
    assert sfp.decode(np.array([0xFF], np.uint8))[0] == np.float32(-1.875)
    assert sfp.decode(np.array([0], np.uint8))[0] == 0.0


def test_monotone():
    """Decode must be monotone in the magnitude code."""
    codes = np.arange(0, 128, dtype=np.uint8)
    decoded = sfp.decode(codes)
    assert np.all(np.diff(decoded) > 0)


def test_order_preserved():
    """Stream order: byte i corresponds to value i (sfp_test TestAllOrder)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.8, 1.8, size=999).astype(np.float32)
    enc = sfp.encode(x)
    assert enc.shape == x.shape
    # Decoding a slice equals slicing the decode: seekable at granularity 1.
    np.testing.assert_array_equal(sfp.decode(enc[10:20]), sfp.decode(enc)[10:20])


def test_encdec_distribution():
    """Absolute error bound on [-1.875, 1.875].

    sfp_test TestEncDec observes max |err| == 0.0625 (half the grid spacing
    at the top octave) for its inputs; the analytical worst case adds one
    truncated bf16 ulp (the encoder deliberately drops mantissa bit 0,
    sfp-inl.h:75) and truncates f32->bf16 first (sfp-inl.h:478-480), i.e.
    0.0625 + 2^-7 + 2^-7 = 0.078125.
    """
    rng = np.random.default_rng(1)
    x = rng.uniform(-sfp.SFP_MAX, sfp.SFP_MAX, size=100_000).astype(np.float32)
    dec = sfp.decode(sfp.encode(x))
    err = np.abs(dec - x)
    assert err.max() <= 0.078125
    # Relative error of the 3-bit-mantissa range.
    big = np.abs(x) >= 2 ** -7
    rel = np.abs(dec[big] - x[big]) / np.abs(x[big])
    assert rel.max() <= 0.078125 + 1e-3


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        sfp.encode(np.array([2.0], np.float32))


def test_scale_weights():
    x = np.array([3.0, -7.5, 0.5], np.float32)
    scaled, scale = sfp.scale_weights(x)
    assert scale == pytest.approx(7.5 / 1.875)
    assert np.abs(scaled).max() <= sfp.SFP_MAX
    np.testing.assert_allclose(scaled * scale, x, rtol=1e-6)


def test_jax_decode_matches_numpy():
    import jax.numpy as jnp

    codes = np.array([c for c in range(256) if c != 0x80], np.uint8)
    got = np.asarray(sfp.decode_jax(jnp.asarray(codes), dtype=jnp.float32))
    np.testing.assert_array_equal(got, sfp.decode(codes))
