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


@pytest.mark.parametrize("bits", [1, 7, 13, 18, 24, 32])
def test_unpack_pallas_group_matches_spec(bits):
    rng = np.random.default_rng(5)
    G = pallas_codec.group_tiles(bits)
    n, b = 32 * G * 8, 3  # t/G = 8: the kernel's sublane alignment floor
    vals = rng.integers(0, 1 << min(bits, 62), (b, n), dtype=np.uint64) \
        & np.uint64((1 << bits) - 1 if bits < 64 else ~0)
    words = _words_for(vals, bits, n)
    w2d = words.reshape(-1, G * bits)  # free host reshape
    got = np.asarray(pallas_codec.unpack_pallas_group(
        jax.device_put(w2d), bits, n, interpret=True))
    np.testing.assert_array_equal(
        got.reshape(b, n).astype(np.uint64), vals)


@pytest.mark.parametrize("dither", ["none", "midpoint"])
def test_decode_float_pallas_group_bit_identical(dither):
    rng = np.random.default_rng(10)
    bits, b = 18, 5
    G = pallas_codec.group_tiles(bits)
    n = 32 * G * 8
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
    got = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, G * bits), mins, low, high, pix, periodic,
        bits, n, dither=dither, interpret=True))
    np.testing.assert_array_equal(ref.view(np.uint32),
                                  got.reshape(b, n).view(np.uint32))


def test_supported_group_predicate():
    assert pallas_codec.group_tiles(18) == 64
    assert pallas_codec.group_tiles(13) == 128
    assert pallas_codec.supported_group(18, 1 << 17, 250000)
    assert pallas_codec.supported_group(13, 1 << 17, 250000)
    assert not pallas_codec.supported_group(18, 1 << 11 | 32, 250000)
    assert not pallas_codec.supported_group(18, 32 * 64 * 4, 250000)
    assert not pallas_codec.supported_group(13, 2048, 250000)  # G=128
    assert not pallas_codec.supported_group(18, 1 << 17, 1 << 25)


def test_supported_predicate():
    assert pallas_codec.supported(18, 1 << 17, 250000)
    assert not pallas_codec.supported(0, 1 << 17, 250000)
    assert not pallas_codec.supported(33, 1 << 17, 250000)
    assert not pallas_codec.supported(18, 1000, 250000)  # n % 32 != 0
    assert not pallas_codec.supported(18, 1 << 17, 1 << 25)


# ---------------------------------------------------------------------------
# fused encode kernel (ops/pallas_encode.py)
# ---------------------------------------------------------------------------


def test_limb_quantizer_bit_equal_to_fastdiv():
    """The 16-bit-limb u32 reimplementation of the exact quantizer is
    bit-for-bit fastdiv.quantize_fast, including pixel boundaries and
    subnormal inputs."""
    from minnow_tpu.ops import fastdiv, pallas_encode
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    dxs = np.array([0.001, 0.5, 3.0, 1e-6, 0.1], np.float32)
    b, eb, m0, m1, ok = fastdiv.divisor_magic(dxs)
    assert ok.all()
    for i, dx in enumerate(dxs):
        diffs = np.concatenate([
            rng.uniform(0, 250, 5000).astype(np.float32),
            np.arange(100).astype(np.float32) * dx,
            np.nextafter(np.arange(50, dtype=np.float32) * dx, np.inf),
            np.nextafter(np.arange(50, dtype=np.float32) * dx, -np.inf),
            np.array([0.0, -0.0, 1e-38, -1e-38,
                      np.float32(2.0 ** -149), 1e38, -5.5], np.float32),
        ])
        qf, ex_f = fastdiv.quantize_fast(
            diffs, np.uint64(b[i]), np.int64(eb[i]), np.uint64(m0[i]),
            np.uint64(m1[i]), out32=True)
        f = jax.jit(lambda d, i=i: pallas_encode._quantize_limb(
            d, jnp.uint32(b[i]), jnp.int32(eb[i]), jnp.uint32(m0[i]),
            jnp.uint32(m1[i])))
        ql, ex_l = f(diffs)
        ql, ex_l, qf, ex_f = map(np.asarray, (ql, ex_l, qf, ex_f))
        np.testing.assert_array_equal(ex_f, ex_l)
        both = ex_f & ex_l
        np.testing.assert_array_equal(ql[both], qf[both])

        # slim production variant: SOUND (certified => spec value) and
        # not over-flagging the common case.  The normative value is
        # floor(RN32(diff/dx)) via numpy's correctly rounded f32 divide.
        fs = jax.jit(lambda d, i=i: pallas_encode._quantize_limb(
            d, jnp.uint32(b[i]), jnp.int32(eb[i]), jnp.uint32(m0[i]),
            jnp.uint32(m1[i]), slim=True))
        qs, ex_s = map(np.asarray, fs(diffs))
        with np.errstate(all="ignore"):
            want = np.floor((diffs / dx).astype(np.float64))
        cert = ex_s & np.isfinite(want)
        np.testing.assert_array_equal(qs[cert].astype(np.float64),
                                      want[cert])
        # flagged cases route to fallback; common-case positives with
        # in-range quotients (pixels < 2^24 in any valid column) certify
        common = (diffs > 1e-30) & ex_f & (want < 2.0**23)
        assert ex_s[common].all()


def test_encode_float_pallas_byte_exact():
    """Fused encode == spec.encode_float_block bytes for width-matching
    blocks; width-mismatched (clustered) blocks are flagged for the
    fallback path."""
    from minnow_tpu.ops import fastdiv, pallas_encode

    rng = np.random.default_rng(12)
    B, n, bits = 6, 4096, 18
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    x = rng.uniform(0, 249.9, (B, n)).astype(np.float32)
    x[3] = rng.uniform(0, 2.0, n).astype(np.float32)  # narrow width
    lowv = np.full(B, low, np.float32)
    pixv = np.full(B, pixels, np.int64)
    per = np.ones(B, bool)
    dxq = np.full(B, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()

    words, mins, maxd, valid = pallas_encode.encode_float_pallas(
        x, lowv, db, deb, dm0, dm1, pixv, per, bits, n, interpret=True)
    words, mins, maxd, valid = map(np.asarray, (words, mins, maxd,
                                                valid))
    assert valid.all()
    narrow = 0
    for i in range(B):
        payload, mn, bts, _ = spec.encode_float_block(
            x[i], low, high, pixels)
        assert mins[i] == mn
        assert spec.precision_needed(int(maxd[i])) == bts
        if bts == bits:
            assert bitpack.words_to_bytes(words[i], bits, n) == payload
        else:
            narrow += 1
    assert narrow == 1  # the clustered block routes to the fallback


def test_encode_float_pallas_group_byte_exact():
    """Group-aligned fused encode == spec.encode_float_block bytes,
    same fallback-flag contract as the per-tile kernel."""
    from minnow_tpu.ops import fastdiv, pallas_encode

    rng = np.random.default_rng(13)
    bits = 18
    G = pallas_codec.group_tiles(bits)
    B, n = 6, 32 * G * 8
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    x = rng.uniform(0, 249.9, (B, n)).astype(np.float32)
    x[3] = rng.uniform(0, 2.0, n).astype(np.float32)  # narrow width
    lowv = np.full(B, low, np.float32)
    pixv = np.full(B, pixels, np.int64)
    per = np.ones(B, bool)
    dxq = np.full(B, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()

    assert pallas_encode.supported_group_enc(bits, n, pixels)
    x2d = x.reshape(-1, G * 32)  # free host reshape
    words, mins, maxd, valid = pallas_encode.encode_float_pallas_group(
        x2d, lowv, db, deb, dm0, dm1, pixv, per, bits, n,
        interpret=True)
    words = np.asarray(words).reshape(B, (n // 32) * bits)
    mins, maxd, valid = map(np.asarray, (mins, maxd, valid))
    assert valid.all()
    narrow = 0
    for i in range(B):
        payload, mn, bts, _ = spec.encode_float_block(
            x[i], low, high, pixels)
        assert mins[i] == mn
        assert spec.precision_needed(int(maxd[i])) == bts
        if bts == bits:
            assert bitpack.words_to_bytes(words[i], bits, n) == payload
        else:
            narrow += 1
    assert narrow == 1
