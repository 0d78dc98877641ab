"""fields.py wire-format tests, mirroring io/fields_test.cc semantics."""

import numpy as np

from gemma_tpu.io.fields import Fields, read_fields, write_fields


class Inner(Fields):
    def __init__(self):
        self.a = 3
        self.s = "hi"

    def visit(self, v):
        self.a = v.u32(self.a)
        self.s = v.string(self.s)


class Outer(Fields):
    def __init__(self):
        self.x = 7
        self.neg = -5
        self.big = (1 << 40) + 9
        self.f = 1.5
        self.flag = True
        self.inner = Inner()
        self.vec = [1, 2, 3]
        self.names = ["ab", "cdef"]

    def visit(self, v):
        self.x = v.u32(self.x)
        self.neg = v.i32(self.neg)
        self.big = v.u64(self.big)
        self.f = v.f32(self.f)
        self.flag = v.boolean(self.flag)
        v.fields(self.inner)
        self.vec = v.vector(self.vec, "u32")
        self.names = v.vector(self.names, "string")


class OuterV2(Outer):
    """Outer with an appended field (new code)."""

    def __init__(self):
        super().__init__()
        self.extra = 42

    def visit(self, v):
        super().visit(v)
        self.extra = v.u32(self.extra)


def test_roundtrip():
    a = Outer()
    a.x = 123
    a.neg = -99
    a.big = (1 << 50) + 1
    a.f = -2.25
    a.flag = False
    a.inner.a = 11
    a.inner.s = "tensor"
    a.vec = [9, 8]
    a.names = ["abc"]
    span = write_fields(a)
    b = Outer()
    result = read_fields(b, span)
    assert result.pos == len(span)
    assert result.missing_fields == 0 and result.extra_u32 == 0
    assert (b.x, b.neg, b.big, b.f, b.flag) == (123, -99, (1 << 50) + 1, -2.25, False)
    assert (b.inner.a, b.inner.s) == (11, "tensor")
    assert b.vec == [9, 8] and b.names == ["abc"]


def test_old_code_new_data():
    """Old reader skips appended fields, counts them as extra."""
    new = OuterV2()
    span = write_fields(new)
    old = Outer()
    result = read_fields(old, span)
    assert result.pos != 0
    assert result.extra_u32 == 1
    assert old.x == 7


def test_new_code_old_data():
    """New reader keeps defaults for missing appended fields."""
    old = Outer()
    span = write_fields(old)
    new = OuterV2()
    new.extra = 1234  # default before read
    result = read_fields(new, span)
    assert result.pos != 0
    assert result.missing_fields == 1
    assert new.extra == 1234  # untouched default


def test_length_prefix_layout():
    """Top level is [payload_len][payload...]."""
    a = Inner()
    span = write_fields(a)
    assert span[0] == len(span) - 1
    assert span[1] == 3  # a
    assert span[2] == 1  # string num_u32
    assert span[3] == int.from_bytes(b"hi\0\0", "little")


def test_invalid_string_rejected():
    a = Inner()
    a.s = "café"  # non-ASCII
    try:
        write_fields(a)
        raised = False
    except (ValueError, UnicodeEncodeError):
        raised = True
    assert raised


def test_corrupt_data_returns_pos_zero():
    import warnings

    a = Inner()
    span = write_fields(a)
    bad = np.array(span, np.uint32)
    bad[0] = 10_000  # nested length exceeds span
    b = Inner()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        result = read_fields(b, bad)
    assert result.pos == 0
