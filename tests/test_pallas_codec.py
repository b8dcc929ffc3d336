"""Interpret-mode validation of the fused Pallas decode kernel
(ops/pallas_codec.py) against the normative spec and the XLA decode.

Hardware lowering is validated separately on the real chip
(tools/pallas_decode_check.py, driven by the experiment queue);
interpret mode pins the semantics."""

import numpy as np
import pytest

import jax

from minnow_tpu.core import spec
from minnow_tpu.ops import bitpack, codec, pallas_codec


def _words_for(vals, bits, n):
    return np.stack([
        np.frombuffer(
            spec.pack_bits(v, bits)
            + b"\0" * (bitpack.words_per_block(bits, n) * 4
                       - spec.array_bytes(bits, n)), dtype="<u4")
        for v in vals])


@pytest.mark.parametrize("bits", [1, 7, 13, 18, 24, 32])
def test_unpack_pallas_matches_spec(bits):
    rng = np.random.default_rng(3)
    n, b = 2048, 3
    vals = rng.integers(0, 1 << min(bits, 62), (b, n), dtype=np.uint64) \
        & np.uint64((1 << bits) - 1 if bits < 64 else ~0)
    words = _words_for(vals, bits, n)
    got = np.asarray(pallas_codec.unpack_pallas(
        jax.device_put(words), bits, n, interpret=True))
    np.testing.assert_array_equal(got.astype(np.uint64), vals)


@pytest.mark.parametrize("dither", ["none", "midpoint"])
def test_decode_float_pallas_bit_identical(dither):
    rng = np.random.default_rng(9)
    bits, n, b = 18, 4096, 5
    pixels = 250000
    vals = rng.integers(0, pixels, (b, n), dtype=np.uint64)
    words = _words_for(vals, bits, n)
    mins = rng.integers(-3, 3, b).astype(np.int64)
    low = rng.uniform(-10, 0, b).astype(np.float32)
    high = (low + rng.uniform(100, 300, b)).astype(np.float32)
    pix = np.full(b, pixels, np.int64)
    periodic = np.array([True, True, False, True, False])

    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, periodic, np.arange(b), bits, n,
        dither=dither))
    got = np.asarray(pallas_codec.decode_float_pallas(
        words, mins, low, high, pix, periodic, bits, n, dither=dither,
        interpret=True))
    np.testing.assert_array_equal(ref.view(np.uint32),
                                  got.view(np.uint32))


def test_supported_predicate():
    assert pallas_codec.supported(18, 1 << 17, 250000)
    assert not pallas_codec.supported(0, 1 << 17, 250000)
    assert not pallas_codec.supported(33, 1 << 17, 250000)
    assert not pallas_codec.supported(18, 1000, 250000)  # n % 32 != 0
    assert not pallas_codec.supported(18, 1 << 17, 1 << 25)
