"""Container round-trip tests mirroring the reference's four record
fixtures (ref go/minnow_test.go:191-310)."""

import struct

import numpy as np
import pytest

import minnow_tpu as minnow
from minnow_tpu.core import spec


def test_int64_record(tmp_path):
    # ref go/minnow_test.go:191-219
    fname = str(tmp_path / "int_record.test")
    xs = [np.array(v, dtype=np.int64)
          for v in [[1, 2, 3, 4], [5], [6, 7, 8, 9], [10, 11, 12]]]
    text = b"I am a cat and I like to meow."

    w = minnow.create(fname)
    w.header(struct.pack("<QQ", 0xDEADBEEF, len(xs)))
    w.header(text)
    for x in xs:
        w.fixed_size_group(minnow.INT64_GROUP, len(x))
        w.data(x)
    w.header(np.array([len(x) for x in xs], dtype=np.uint64))
    w.close()

    r = minnow.open(fname)
    magic, blocks = struct.unpack("<QQ", r.header(0))
    assert magic == 0xDEADBEEF and blocks == 4
    assert r.header(1) == text
    lengths = r.header(2, np.uint64)
    np.testing.assert_array_equal(lengths, [4, 1, 4, 3])
    for i, x in enumerate(xs):
        got = r.data(i)
        np.testing.assert_array_equal(got, x)
        assert r.data_type(i) == minnow.INT64_GROUP
        assert r.data_len(i) == len(x)
    r.close()


def test_group_record(tmp_path):
    # ref go/minnow_test.go:222-240: interleaved headers and two fixed groups
    fname = str(tmp_path / "group_files.test")
    ix = np.arange(20, dtype=np.int32)
    fx = (np.arange(10) / 10).astype(np.float64)
    text = b"I'm a caaaat"

    w = minnow.create(fname)
    w.header(struct.pack("<qq", 4, 5))
    w.fixed_size_group(minnow.INT32_GROUP, 5)
    for i in range(4):
        w.data(ix[i * 5:(i + 1) * 5])
    w.header(struct.pack("<qq", 2, 5))
    w.fixed_size_group(minnow.FLOAT64_GROUP, 5)
    for i in range(2):
        w.data(fx[i * 5:(i + 1) * 5])
    w.header(text)
    w.close()

    r = minnow.open(fname)
    assert r.header(0, "qq") == (4, 5)
    assert r.header(1, "qq") == (2, 5)
    assert r.header(2) == text
    got_ix = np.concatenate([r.data(i) for i in range(4)])
    got_fx = np.concatenate([r.data(4 + i) for i in range(2)])
    np.testing.assert_array_equal(got_ix, ix)
    np.testing.assert_array_equal(got_fx, fx)
    r.close()


def test_bit_int_record(tmp_path):
    # ref go/minnow_test.go:242-268
    fname = str(tmp_path / "bit_int_record.test")
    x1 = np.array([100, 101, 102, 104], dtype=np.int64)
    x2 = [np.array([1024, 1024, 1024], dtype=np.int64),
          np.array([0, 1023, 500], dtype=np.int64)]
    x3 = np.array([-1000000, -500000], dtype=np.int64)

    w = minnow.create(fname)
    w.int_group(len(x1))
    w.data(x1)
    w.header(np.int64(len(x2)))
    w.int_group(len(x2[0]))
    for x in x2:
        w.data(x)
    w.int_group(len(x3))
    w.data(x3)
    w.close()

    r = minnow.open(fname)
    assert r.header(0, "q") == 2
    np.testing.assert_array_equal(r.data(0), x1)
    np.testing.assert_array_equal(r.data(1), x2[0])
    np.testing.assert_array_equal(r.data(2), x2[1])
    np.testing.assert_array_equal(r.data(3), x3)
    assert r.data_len(0) == 4 and r.data_len(3) == 2
    assert r.data_type(0) == minnow.INT_GROUP
    r.close()


@pytest.mark.parametrize("dither", ["uniform", "none", "midpoint"])
def test_q_float_record(tmp_path, dither):
    # ref go/minnow_test.go:270-310
    fname = str(tmp_path / "q_float_record.test")
    limit = (-50.0, 100.0)
    dx1, dx2 = 1.0, 10.0
    x1 = [np.array(v, dtype=np.float32)
          for v in [[-50, 0, 50, 49], [25, 25, 25, 25]]]
    x2 = [np.array(v, dtype=np.float32)
          for v in [[-50, 0, 50, 49, 0], [1, 2, 3, 4, 5], [0, 20, 0, 20, 0]]]

    w = minnow.create(fname)
    w.header(struct.pack("<ffffqq", dx1, dx2, limit[0], limit[1],
                         len(x1), len(x2)))
    w.float_group(len(x1[0]), limit, dx1)
    for x in x1:
        w.data(x)
    w.float_group(len(x2[0]), limit, dx2)
    for x in x2:
        w.data(x)
    w.close()

    r = minnow.open(fname, dither=dither)
    for i, x in enumerate(x1):
        got = r.data(i)
        assert got.dtype == np.float32
        assert np.all(np.abs(got - x) <= dx1 * (1 + 1e-5))
    for i, x in enumerate(x2):
        got = r.data(len(x1) + i)
        assert np.all(np.abs(got - x) <= dx2 * (1 + 1e-5))
    r.close()


def test_uniform_dither_is_deterministic(tmp_path):
    fname = str(tmp_path / "dither.test")
    x = np.linspace(0, 99, 100).astype(np.float32)
    w = minnow.create(fname)
    w.float_group(len(x), (0.0, 100.0), 0.5)
    w.data(x)
    w.close()

    r1 = minnow.open(fname)
    a = r1.data(0)
    r1.close()
    r2 = minnow.open(fname)
    b = r2.data(0)
    r2.close()
    np.testing.assert_array_equal(a, b)


def test_header_rewrite_and_tail_layout(tmp_path):
    """Byte-level assertions on the container framing itself."""
    fname = str(tmp_path / "layout.test")
    x = np.array([3, 1, 2], dtype=np.int64)
    w = minnow.create(fname)
    w.header(b"hi")
    w.int_group(3)
    w.data(x)
    w.close()

    raw = open(fname, "rb").read()
    magic, version, groups, headers, blocks, tail_start = struct.unpack(
        "<QQQQQq", raw[:48])
    assert magic == minnow.MAGIC and version == minnow.VERSION
    assert groups == 1 and headers == 1 and blocks == 1
    # header block: 2 bytes at offset 48
    assert raw[48:50] == b"hi"
    # data block: deltas [2,0,1] at 2 bits = one byte
    payload, mn, bits = spec.encode_int_block(x)
    assert bits == 2 and mn == 1
    assert raw[50:51] == payload
    assert tail_start == 51
    # tail: headerOffsets, headerSizes, groupOffsets, groupTypes, groupBlocks
    vals = struct.unpack("<qqqqq", raw[51:51 + 40])
    assert vals == (48, 2, 50, minnow.INT_GROUP, 1)
    # group tail: N, startBlock, blocks, then packed mins/bits meta
    n, sb, nb = struct.unpack("<qqq", raw[91:115])
    assert (n, sb, nb) == (3, 0, 1)


def test_corrupt_magic_rejected(tmp_path):
    fname = str(tmp_path / "bad.test")
    with open(fname, "wb") as f:
        f.write(b"\x00" * 48)
    with pytest.raises(ValueError, match="not a minnow file"):
        minnow.open(fname)


def test_write_without_group_raises(tmp_path):
    w = minnow.create(str(tmp_path / "x.test"))
    with pytest.raises(RuntimeError):
        w.data(np.array([1], dtype=np.int64))


def test_type_mismatch_raises(tmp_path):
    w = minnow.create(str(tmp_path / "x.test"))
    w.fixed_size_group(minnow.INT32_GROUP, 2)
    with pytest.raises(TypeError):
        w.data(np.array([1.0, 2.0], dtype=np.float32))
