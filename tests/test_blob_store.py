"""BlobStore tests, mirroring io/blob_store_test.cc."""

import struct

import numpy as np
import pytest

from gemma_tpu.io.blob_store import (
    BLOB_ALIGN,
    END_ALIGN,
    MAGIC,
    BlobReader,
    BlobWriter,
)


def test_write_read_roundtrip(tmp_path):
    path = tmp_path / "test.sbs"
    blobs = {
        "alpha": np.arange(100, dtype=np.uint8),
        "beta": np.arange(257, dtype=np.float32),
        "sixteen_chars_ok": np.array([1, 2, 3], np.uint32),
    }
    with BlobWriter(str(path)) as w:
        for k, v in blobs.items():
            w.add(k, v)

    with BlobReader(str(path)) as r:
        assert r.keys == list(blobs)
        np.testing.assert_array_equal(r.read("alpha"), blobs["alpha"])
        np.testing.assert_array_equal(
            r.read("beta", np.float32), blobs["beta"]
        )
        np.testing.assert_array_equal(
            r.read("sixteen_chars_ok", np.uint32), blobs["sixteen_chars_ok"]
        )


def test_v2_layout(tmp_path):
    """File is V2: leading header has num_blobs=0, trailer holds the truth."""
    path = tmp_path / "v2.sbs"
    with BlobWriter(str(path)) as w:
        w.add("k", b"x" * 10)
    raw = path.read_bytes()
    assert len(raw) % END_ALIGN == 0
    magic, num, file_bytes = struct.unpack("<IIQ", raw[:16])
    assert magic == MAGIC and num == 0
    magic, num, file_bytes = struct.unpack("<IIQ", raw[-16:])
    assert magic == MAGIC and num == 1 and file_bytes == len(raw)
    # First blob payload at offset 256 (kBlobAlign).
    assert raw[BLOB_ALIGN : BLOB_ALIGN + 10] == b"x" * 10


def test_v1_compatibility(tmp_path):
    """Hand-construct a V1 file and read it back."""
    path = tmp_path / "v1.sbs"
    payload = b"hello world!" * 3
    num_blobs = 1
    dir_bytes = 2 * 16 * num_blobs
    payload_off = -(-(16 + dir_bytes) // BLOB_ALIGN) * BLOB_ALIGN
    file_bytes = -(-(payload_off + len(payload)) // END_ALIGN) * END_ALIGN
    raw = bytearray(file_bytes)
    struct.pack_into("<IIQ", raw, 0, MAGIC, num_blobs, file_bytes)
    raw[16:32] = b"greeting" + b"\0" * 8
    struct.pack_into("<QQ", raw, 32, payload_off, len(payload))
    raw[payload_off : payload_off + len(payload)] = payload
    path.write_bytes(bytes(raw))

    with BlobReader(str(path)) as r:
        assert r.keys == ["greeting"]
        assert r.read("greeting").tobytes() == payload


def test_read_slice(tmp_path):
    path = tmp_path / "s.sbs"
    data = np.arange(1000, dtype=np.uint8)
    with BlobWriter(str(path)) as w:
        w.add("data", data)
    with BlobReader(str(path)) as r:
        np.testing.assert_array_equal(r.read_slice("data", 100, 50), data[100:150])


def test_rejects_bad_keys(tmp_path):
    w = BlobWriter(str(tmp_path / "b.sbs"))
    with pytest.raises(ValueError):
        w.add("this_key_is_way_too_long", b"x")
    with pytest.raises(ValueError):
        w.add("", b"x")
    with pytest.raises(ValueError):
        w.add("empty", b"")
    w.add("ok", b"x")
    with pytest.raises(ValueError):
        w.add("ok", b"y")  # duplicate


def test_truncated_file_rejected(tmp_path):
    path = tmp_path / "t.sbs"
    with BlobWriter(str(path)) as w:
        w.add("k", b"x" * 10)
    raw = path.read_bytes()
    path.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        BlobReader(str(path))


def test_native_parallel_read(tmp_path):
    """Native multithreaded reader returns byte-identical blobs."""
    import numpy as np

    from gemma_tpu.io import native_io
    from gemma_tpu.io.blob_store import BlobReader, BlobWriter

    if not native_io.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, 20 << 20, dtype=np.uint8)  # 20 MB
    small = rng.integers(0, 255, 1000, dtype=np.uint8)
    path = str(tmp_path / "big.sbs")
    with BlobWriter(path) as w:
        w.add("big", big)
        w.add("small", small)
    r = BlobReader(path)
    np.testing.assert_array_equal(r.read("big"), big)  # native path
    np.testing.assert_array_equal(r.read("small"), small)

    # direct API with several ranges incl. chunk splits
    ranges = [r.ranges["big"], r.ranges["small"]]
    bufs = native_io.parallel_read(path, ranges, threads=4,
                                   chunk_bytes=1 << 20)
    np.testing.assert_array_equal(bufs[0], big)
    np.testing.assert_array_equal(bufs[1], small)
