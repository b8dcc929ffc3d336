"""Tests of the normative host codec (core/spec.py).

Mirrors the reference's property tests (ref go/bit/bit_test.go:9-69,
python/minnow_test.py) plus hand-computed byte fixtures the reference never
had -- the byte layout is asserted literally, not just round-tripped.
"""

import math

import numpy as np
import pytest

from minnow_tpu.core import spec


# ---------------------------------------------------------------------------
# precision / sizes
# ---------------------------------------------------------------------------

def test_precision_needed_matches_go_formula_small():
    for v in list(range(0, 4100)) + [2**k + d for k in range(13, 46)
                                     for d in (-1, 0, 1)]:
        assert spec.precision_needed(v) == spec.precision_needed_go(v), v


def test_precision_needed_exact():
    assert spec.precision_needed(0) == 0
    assert spec.precision_needed(1) == 1
    assert spec.precision_needed(255) == 8
    assert spec.precision_needed(256) == 9
    # The exact answer where the reference's float64 formula undercounts:
    assert spec.precision_needed(2**50) == 51
    assert spec.precision_needed_go(2**50) == 50  # documented divergence


def test_array_bytes():
    assert spec.array_bytes(0, 100) == 0
    assert spec.array_bytes(1, 8) == 1
    assert spec.array_bytes(1, 9) == 2
    assert spec.array_bytes(11, 3) == 5  # 33 bits
    assert spec.array_bytes(64, 7) == 56


# ---------------------------------------------------------------------------
# bit packing -- hand fixtures (byte-literal) + property round trips
# ---------------------------------------------------------------------------

def test_pack_hand_fixture_3bit():
    # values 1,2,3,4 at 3 bits: bits 001 010 011 100 LSB-first per element
    # stream (low bit first): 1,0,0, 0,1,0, 1,1,0, 0,0,1 ->
    # byte0 = 1,0,0,0,1,0,1,1 (bit0..bit7) = 0b11010001 = 0xD1
    # byte1 = 0,0,0,1 -> 0b1000 = 0x08
    out = spec.pack_bits(np.array([1, 2, 3, 4], dtype=np.uint64), 3)
    assert out == bytes([0xD1, 0x08])


def test_pack_hand_fixture_8bit_and_16bit():
    out = spec.pack_bits(np.array([0xAB, 0xCD], dtype=np.uint64), 8)
    assert out == bytes([0xAB, 0xCD])
    out = spec.pack_bits(np.array([0x1234], dtype=np.uint64), 16)
    assert out == bytes([0x34, 0x12])


def test_pack_masks_high_bits():
    out = spec.pack_bits(np.array([0xFF], dtype=np.uint64), 4)
    assert out == bytes([0x0F])


def test_pack_zero_bits():
    assert spec.pack_bits(np.array([5, 6], dtype=np.uint64), 0) == b""
    assert list(spec.unpack_bits(b"", 0, 3)) == [0, 0, 0]


@pytest.mark.parametrize("bits", list(range(1, 65)))
def test_pack_roundtrip_all_widths(bits):
    rng = np.random.default_rng(bits)
    x = rng.integers(0, 2**63, size=257, dtype=np.int64).view(np.uint64)
    x = x << np.uint64(1) | rng.integers(0, 2, 257).astype(np.uint64)
    packed = spec.pack_bits(x, bits)
    assert len(packed) == spec.array_bytes(bits, 257)
    got = spec.unpack_bits(packed, bits, 257)
    mask = spec._mask(bits)
    np.testing.assert_array_equal(got, x & mask)


def test_pack_is_lsb_first_across_byte_boundary():
    # 11-bit value 0b10000000001 = 1025: byte0 = 0x01, byte1 has bits 8..10
    out = spec.pack_bits(np.array([1025], dtype=np.uint64), 11)
    assert out == bytes([0x01, 0x04])


# ---------------------------------------------------------------------------
# periodic helpers
# ---------------------------------------------------------------------------

def test_periodic_distance():
    assert spec.periodic_distance(5, 3, 100) == 2
    assert spec.periodic_distance(3, 5, 100) == -2
    assert spec.periodic_distance(99, 0, 100) == -1
    assert spec.periodic_distance(0, 99, 100) == 1
    assert spec.periodic_distance(75, 25, 100) == 50
    assert spec.periodic_distance(25, 75, 100) == -50


def test_periodic_min_simple():
    assert spec.periodic_min([5, 6, 7], 100) == 5
    assert spec.periodic_min([98, 99, 0, 1], 100) == 98
    # spread over more than half the circle -> 0
    assert spec.periodic_min([0, 33, 66], 99) == 0


def test_periodic_min_fast_matches_greedy():
    rng = np.random.default_rng(0)
    for pixels in [7, 16, 100, 1001, 2**18]:
        for trial in range(60):
            n = int(rng.integers(1, 50))
            if trial % 3 == 0:
                # clustered (possibly wrapping) windows
                start = int(rng.integers(0, pixels))
                w = int(rng.integers(1, max(2, pixels // 2)))
                x = (start + rng.integers(0, w, size=n)) % pixels
            else:
                x = rng.integers(0, pixels, size=n)
            want = spec.periodic_min(x, pixels)
            got, valid = spec.periodic_min_fast(x, pixels)
            assert valid
            assert got == want, (pixels, x)


def test_periodic_min_fast_adversarial_half_window():
    # windows of exactly half the circle and half+1
    for pixels in [100, 101]:
        half = pixels // 2
        x = np.arange(0, half)  # width == half -> not > half -> keep start 0
        want = spec.periodic_min(x, pixels)
        got, valid = spec.periodic_min_fast(x, pixels)
        assert valid and got == want
        x = np.arange(0, half + 1)  # width == half+1 -> 0
        want = spec.periodic_min(x, pixels)
        got, valid = spec.periodic_min_fast(x, pixels)
        assert valid and got == want == 0
        # wrapped window ending at the boundary
        x = np.concatenate([np.arange(pixels - 3, pixels), np.arange(0, 4)])
        want = spec.periodic_min(x, pixels)
        got, valid = spec.periodic_min_fast(x, pixels)
        assert valid and got == want == pixels - 3


def test_periodic_min_fast_flags_out_of_range():
    _, valid = spec.periodic_min_fast(np.array([0, 100]), 100)
    assert not valid
    _, valid = spec.periodic_min_fast(np.array([-1, 5]), 100)
    assert not valid


def test_bound():
    out = spec.bound(np.array([-3, 0, 5, 99, 103]), 0, 100)
    np.testing.assert_array_equal(out, [97, 0, 5, 99, 3])
    out = spec.bound(np.array([1, 40, 90]), 40, 100)
    np.testing.assert_array_equal(out, [101, 40, 90])


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

def test_float_group_pixels():
    # ref go/writer.go:72-75: pixels = ceil(f32(high-low)/f32(dx))
    assert spec.float_group_pixels(0, 250, 1) == 250
    assert spec.float_group_pixels(-50, 100, 1.0) == 150
    assert spec.float_group_pixels(-50, 100, 10.0) == 15
    assert spec.float_group_pixels(0, 1, 0.3) == 4


def test_quantize_fixture():
    q = spec.quantize(np.array([-50, 0, 50, 49], dtype=np.float32),
                      -50, 100, 150)
    np.testing.assert_array_equal(q, [0, 50, 100, 99])


def test_quantize_float32_semantics():
    # dx computed in f32; values at pixel boundaries floor downward
    low, high, pixels = 0.0, 1.0, 3
    dx = spec.quantize_dx(low, high, pixels)
    assert dx == np.float32(np.float32(1.0) / np.float32(3))
    x = np.array([0.0, dx * 0.999, dx, 0.999999], dtype=np.float32)
    q = spec.quantize(x, low, high, pixels)
    assert q[0] == 0 and q[1] == 0 and q[2] == 1


def test_dequantize_within_dx():
    rng = np.random.default_rng(3)
    low, high, dx = -50.0, 100.0, 1.0
    pixels = spec.float_group_pixels(low, high, dx)
    x = rng.uniform(low, high - 1e-3, 1000).astype(np.float32)
    q = spec.quantize(x, low, high, pixels)
    u = rng.uniform(0, 1, 1000)
    xhat = spec.dequantize(q, low, high, pixels, u=u)
    assert np.all(np.abs(xhat - x) <= dx * (1 + 1e-5))


# ---------------------------------------------------------------------------
# block codecs
# ---------------------------------------------------------------------------

def test_int_block_roundtrip():
    for x in [
        np.array([100, 101, 102, 104], dtype=np.int64),
        np.array([1024, 1024, 1024], dtype=np.int64),   # constant -> bits 0
        np.array([0, 1023, 500], dtype=np.int64),
        np.array([-1000000, -500000], dtype=np.int64),  # negatives
        np.array([2**62, -2**62], dtype=np.int64),      # 64-bit span
    ]:
        payload, mn, bits = spec.encode_int_block(x)
        assert mn == x.min()
        got = spec.decode_int_block(payload, mn, bits, len(x))
        np.testing.assert_array_equal(got, x)


def test_int_block_constant_is_zero_bytes():
    payload, mn, bits = spec.encode_int_block(
        np.array([7, 7, 7], dtype=np.int64))
    assert bits == 0 and payload == b"" and mn == 7


def test_float_block_roundtrip_periodic():
    rng = np.random.default_rng(7)
    low, high, dx = 0.0, 250.0, 0.01
    pixels = spec.float_group_pixels(low, high, dx)
    # clustered positions near the periodic boundary
    x = ((rng.uniform(-5, 5, 5000) + 250) % 250).astype(np.float32)
    payload, mn, bits, q = spec.encode_float_block(x, low, high, pixels)
    # recentring should compact the window: width << pixels
    assert bits < spec.precision_needed(pixels)
    dec_q = spec.decode_int_block(payload, mn, bits, len(x))
    dec_q = spec.bound(dec_q, 0, pixels)
    xhat = spec.dequantize(dec_q, low, high, pixels)
    d = np.abs(xhat - x)
    d = np.minimum(d, 250 - d)  # periodic distance
    assert np.all(d <= dx * (1 + 1e-4))
