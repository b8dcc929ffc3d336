"""Interpret-mode width x shape x periodic sweeps of the group-aligned
Pallas kernels (VERDICT r2 #8): certification-boundary cases -- width
mismatch, invalid blocks, the merge (kpb) and cap (t_g=256) edges --
covered on the CPU suite without chip time.  Production engages
DATA-determined widths, so every structural width class must hold, not
just the flagship 18 bits.

All comparisons are bitwise against the XLA paths / host spec
(the byte contract, ref go/group.go + go/bit/bit.go).
"""

import numpy as np
import pytest

from minnow_tpu.core import spec
from minnow_tpu.ops import bitpack, codec, fastdiv, pallas_codec, \
    pallas_encode


def _pack_words(vals, bits, n):
    return np.stack([
        bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
        for v in vals])


# width classes: _tile_step in {8, 4, 2, 1} x group size {64, 128},
# both <= 32 (float/u32 unpack) and 33-64 (limb unpack)
SWEEP_BITS_32 = (1, 7, 11, 23, 31, 32)
SWEEP_BITS_64 = (33, 45, 63)


@pytest.mark.parametrize("bits", SWEEP_BITS_32)
@pytest.mark.parametrize("t_g", (8, 16))
def test_group_float_decode_sweep(bits, t_g):
    """Fused float decode across widths x block sizes (t_g=8 engages
    the multi-block merge, 16 the per-block path) x mixed periodic,
    bitwise vs the XLA decode."""
    rng = np.random.default_rng(bits * 100 + t_g)
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * t_g
    bsz = 3
    pixels = min((1 << bits) - 1, (1 << 24) - 1)
    if pixels < 1:
        pixels = 1
    vals = rng.integers(0, 1 << bits, (bsz, n), dtype=np.uint64)
    words = _pack_words(vals, bits, n)
    mins = rng.integers(-2, 3, bsz).astype(np.int64)
    low = rng.uniform(-5, 0, bsz).astype(np.float32)
    high = (low + rng.uniform(10, 100, bsz)).astype(np.float32)
    pix = np.full(bsz, pixels, np.int64)
    per = np.arange(bsz) != 1  # mixed periodic
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, np.arange(bsz), bits, n,
        dither="none"))
    got = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, g * bits), mins, low, high, pix, per,
        bits, n, dither="none", interpret=True)).reshape(bsz, n)
    np.testing.assert_array_equal(ref.view(np.uint32),
                                  got.view(np.uint32))


@pytest.mark.parametrize("bits", SWEEP_BITS_64)
def test_group_int_decode_sweep(bits):
    """Wide (33-64-bit) limb unpack + fused int64 combine across the
    remaining width classes, bitwise vs the XLA int decode."""
    rng = np.random.default_rng(bits)
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * 8
    vals = rng.integers(0, (1 << bits) - 1 if bits == 64 else 1 << bits,
                        (2, n), dtype=np.uint64)
    words = _pack_words(vals, bits, n)
    mins = rng.integers(-100, 100, 2).astype(np.int64)
    ref = np.asarray(codec.decode_int_blocks(words, mins, bits, n))
    got = np.asarray(codec.decode_int_blocks_group(
        words.reshape(-1, g * bits), mins, bits, n, interpret=True))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("bits", (1, 7, 11, 23))
def test_group_encode_sweep(bits):
    """Fused group encode across widths (the flagship 18 is covered by
    validate/test_pipeline): mixed periodic, a wrap cluster, and a
    width-mismatch (narrow) block that must fall back -- end-to-end
    through the production BlockEncoder, byte-identical to XLA."""
    from minnow_tpu.parallel.pipeline import BlockEncoder

    rng = np.random.default_rng(bits)
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * 8
    pixels = 1 << bits  # predicted width = bits
    low, high = 0.0, 100.0
    dx = (high - low) / pixels
    bsz = 4
    x = (rng.integers(0, pixels, (bsz, n)).astype(np.float64) * dx
         + dx * 0.3).astype(np.float32)
    if bits >= 4:
        # wrap cluster around the periodic seam
        wrap_q = np.concatenate([
            rng.integers(0, 2, n // 2),
            pixels - 1 - rng.integers(0, 2, n - n // 2)])
        x[1] = (wrap_q.astype(np.float64) * dx + dx * 0.3).astype(
            np.float32)
        # narrow block: true width < predicted -> fallback class
        x[2] = (rng.integers(0, 2, n).astype(np.float64) * dx
                + dx * 0.3).astype(np.float32)
    per = np.array([True, True, True, False])

    want = BlockEncoder(pallas=False).encode_float_blocks(
        x, low, high, pixels, periodic=per)
    got = BlockEncoder(pallas=True).encode_float_blocks(
        x, low, high, pixels, periodic=per)
    assert got.payloads == want.payloads
    np.testing.assert_array_equal(got.mins, want.mins)
    np.testing.assert_array_equal(got.bits, want.bits)
    if bits >= 4:
        assert want.bits[2] < bits  # mismatch class actually exercised


def test_group_encode_cap_edges():
    """The fused encode's 512k cap edge: t_g=256 (the largest fused
    shape) goes through the fused kernel, one step beyond through the
    two-dispatch big-block path -- both byte-identical to XLA.
    Interpret-mode cost is bounded by bsz=1."""
    from minnow_tpu.parallel.pipeline import BlockEncoder

    rng = np.random.default_rng(77)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    for t_g in (256, 264):  # at the cap / beyond it (bigblock path)
        n = 32 * g * t_g
        at_cap = pallas_encode.supported_group_enc(bits, n, pixels)
        assert at_cap == (t_g <= 256)
        assert pallas_encode.supported_pack_enc(bits, n, pixels)
        x = rng.uniform(0, 249.9, (1, n)).astype(np.float32)
        x[0, :2] = [0.0, 249.9]
        want = BlockEncoder(pallas=False).encode_float_blocks(
            x, low, high, pixels)
        got = BlockEncoder(pallas=True).encode_float_blocks(
            x, low, high, pixels)
        assert got.payloads == want.payloads, t_g
        np.testing.assert_array_equal(got.mins, want.mins)
        np.testing.assert_array_equal(got.bits, want.bits)


def test_group_encode_invalid_blocks_fall_back():
    """Out-of-range pixels (raw float API) and non-finite inputs are
    flagged by the kernel and re-encoded via the normative host scan;
    bytes match the XLA/host path exactly."""
    from minnow_tpu.parallel.pipeline import BlockEncoder

    rng = np.random.default_rng(88)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * 8
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    x = rng.uniform(0, 249.9, (3, n)).astype(np.float32)
    x[1, 5] = 260.0   # q >= pixels: invalid for the one-pass reduction
    x[2, 7] = -3.0    # negative diff: slim-quantizer flag class
    want = BlockEncoder(pallas=False).encode_float_blocks(
        x, low, high, pixels)
    got = BlockEncoder(pallas=True).encode_float_blocks(
        x, low, high, pixels)
    assert got.payloads == want.payloads
    np.testing.assert_array_equal(got.mins, want.mins)
    np.testing.assert_array_equal(got.bits, want.bits)


@pytest.mark.parametrize("bits", (7, 18, 23))
@pytest.mark.parametrize("periodic", (True, False))
def test_group_encode_const_specialized(bits, periodic, monkeypatch):
    """Column-constant specialization (const_cfg): identical words,
    stats, valid flags across widths and both static-periodic branches,
    including the wrap cluster and the invalid-block flag class; and
    the production opt-in (MINNOW_TPU_PALLAS_CONST=1) stays
    byte-identical end-to-end through BlockEncoder."""
    from minnow_tpu.parallel.pipeline import BlockEncoder

    rng = np.random.default_rng(bits * 7 + periodic)
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * 8
    pixels = (1 << bits) - 1
    low, high = 0.0, 100.0
    dx = (high - low) / pixels
    bsz = 4
    x = (rng.integers(0, pixels, (bsz, n)).astype(np.float64) * dx
         + dx * 0.3).astype(np.float32)
    if bits >= 4:
        wrap_q = np.concatenate([
            rng.integers(0, 2, n // 2),
            pixels - 1 - rng.integers(0, 2, n - n // 2)])
        x[1] = (wrap_q.astype(np.float64) * dx + dx * 0.3).astype(
            np.float32)
    x[3, 7] = high + 5.0  # out-of-range: the invalid/fallback class

    lowv = np.full(bsz, low, np.float32)
    pixv = np.full(bsz, pixels, np.int64)
    perv = np.full(bsz, periodic, bool)
    dxq = np.full(bsz, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()
    base = tuple(np.asarray(a) for a in
                 pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=True))
    cfg = (float(low), int(db[0]), int(deb[0]), int(dm0[0]),
           int(dm1[0]), int(pixels), bool(periodic))
    const = tuple(np.asarray(a) for a in
                  pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=True, const_cfg=cfg))
    for a, c, name in zip(base, const, ("words", "mins", "maxd",
                                        "valid")):
        np.testing.assert_array_equal(a, c, err_msg=name)

    # production opt-in end-to-end (uniform scalars -> const engages)
    monkeypatch.setenv("MINNOW_TPU_PALLAS_CONST", "1")
    want = BlockEncoder(pallas=False).encode_float_blocks(
        x, low, high, pixels, periodic=periodic)
    got = BlockEncoder(pallas=True).encode_float_blocks(
        x, low, high, pixels, periodic=periodic)
    assert got.payloads == want.payloads
    np.testing.assert_array_equal(got.mins, want.mins)
    np.testing.assert_array_equal(got.bits, want.bits)

    # NON-uniform scalars must NOT engage the const path (and still be
    # byte-identical through the generic kernel)
    low2 = np.full(bsz, low, np.float32)
    low2[0] = low + 1.0
    got2 = BlockEncoder(pallas=True).encode_float_blocks(
        x, low2, high, pixels, periodic=periodic)
    want2 = BlockEncoder(pallas=False).encode_float_blocks(
        x, low2, high, pixels, periodic=periodic)
    assert got2.payloads == want2.payloads


@pytest.mark.parametrize("bits", (11, 33, 45, 64))
def test_int_pack_kernel_sweep_multi_chunk(bits):
    """The stateless int pack kernel across multi-chunk shapes
    (t_g = 16: two 8-row chunks per block) and widths on both sides of
    32, bitwise vs spec."""
    rng = np.random.default_rng(bits + 7)
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * 16
    hi_excl = (1 << bits) - 1 if bits == 64 else (1 << bits)
    vals = rng.integers(0, hi_excl, (2, n), dtype=np.uint64)
    mins = rng.integers(-50, 50, 2).astype(np.int64)
    x = vals.view(np.int64) + mins[:, None]
    lens = np.full(2, n, np.int64)
    words = np.asarray(pallas_encode.delta_pack_int_pallas(
        x, mins, lens, bits, n, n, interpret=True))
    for i in range(2):
        ref = spec.pack_bits((x[i] - mins[i]).view(np.uint64), bits)
        assert bitpack.words_to_bytes(words[i], bits, n) == ref, i


@pytest.mark.parametrize("t_g", (8, 128))
def test_fused_uniform_decode_sweep_widths(t_g):
    """Fused uniform decode at a non-flagship width (11 bits) in both
    kernel variants, bitwise vs XLA."""
    rng = np.random.default_rng(61 + t_g)
    bits = 11
    g = pallas_codec.group_tiles(bits)
    n = 32 * g * t_g
    bsz = 2
    pixels = (1 << bits) - 1
    vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
    words = _pack_words(vals, bits, n)
    mins = np.zeros(bsz, np.int64)
    low = np.zeros(bsz, np.float32)
    high = np.full(bsz, 100.0, np.float32)
    pix = np.full(bsz, pixels, np.int64)
    per = np.ones(bsz, bool)
    ids = np.arange(bsz, dtype=np.int64)
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, ids, bits, n,
        dither="uniform", seed=2))
    k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, 2))
    got = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, g * bits), mins, low, high, pix, per,
        bits, n, dither="uniform", interpret=True,
        key1=k1, key2=k2)).reshape(bsz, n)
    np.testing.assert_array_equal(ref.view(np.uint32),
                                  got.view(np.uint32))
