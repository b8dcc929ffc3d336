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


def test_pack_int_pallas_group_width_sweep():
    """The stateless int pack kernel (interpret mode) == spec.pack_bits
    across the width classes incl. the 33-64-bit limb planar path
    (ref go/bit/bit.go:106-131), with masked tails and negative mins."""
    from minnow_tpu.ops import pallas_encode
    from minnow_tpu.ops.pallas_codec import group_tiles

    rng = np.random.default_rng(41)
    for bits in (1, 7, 18, 32, 33, 41, 47, 64):
        g = group_tiles(bits)
        n = 32 * g * 8
        hi_excl = (1 << bits) - 1 if bits == 64 else (1 << bits)
        vals = rng.integers(0, hi_excl, (2, n), dtype=np.uint64)
        mins = rng.integers(-1000, 1000, 2).astype(np.int64)
        x = vals.view(np.int64) + mins[:, None]
        lens = np.array([n, n - 37], np.int64)
        words = np.asarray(pallas_encode.delta_pack_int_pallas(
            x, mins, lens, bits, n, n, interpret=True))
        for i in range(2):
            d = np.zeros(n, np.uint64)
            d[:lens[i]] = (x[i, :lens[i]] - mins[i]).view(np.uint64)
            ref = spec.pack_bits(d, bits)
            got = bitpack.words_to_bytes(words[i], bits, n)
            assert got == ref, (bits, i)


def test_pack_int_pallas_group_padded_n():
    """Unaligned block lengths pad to the kernel alignment; the sliced
    byte stream still equals spec exactly (padded deltas are zero)."""
    from minnow_tpu.ops import pallas_encode
    from minnow_tpu.ops.pallas_codec import group_tiles

    rng = np.random.default_rng(43)
    bits = 41
    g = group_tiles(bits)
    align = 32 * g * 8
    n = align - 123
    n_pad = align
    x = rng.integers(0, 1 << 41, (3, n), dtype=np.uint64).view(np.int64)
    mins = x.min(axis=1)
    lens = np.full(3, n, np.int64)
    words = np.asarray(pallas_encode.delta_pack_int_pallas(
        x, mins, lens, bits, n, n_pad, interpret=True))
    for i in range(3):
        ref = spec.pack_bits((x[i] - mins[i]).view(np.uint64), bits)
        got = bitpack.words_to_bytes(words[i], bits, n)
        assert got == ref, i


def test_int_encode_production_pallas_path(monkeypatch):
    """BlockEncoder(pallas=True) routes aligned int buckets through the
    group pack kernel (interpret mode on CPU) and still produces
    spec-exact bytes; a too-small block in the same batch takes the XLA
    path (mixed widths -> mixed paths, same bytes)."""
    from minnow_tpu.ops import selfcheck
    from minnow_tpu.ops.pallas_codec import group_tiles
    from minnow_tpu.parallel.pipeline import BlockEncoder

    monkeypatch.setenv("MINNOW_TPU_PALLAS_SELFCHECK", "0")
    rng = np.random.default_rng(45)
    n = 32 * group_tiles(41) * 8
    x = rng.integers(0, 1 << 40, (4, n), dtype=np.int64)
    x[0, 0], x[0, 1] = 0, (1 << 41) - 1     # width 41 (kernel path)
    x[1] = rng.integers(0, 1 << 20, n)      # width <= 32 (lo-only path)
    x[2] = 7                                # constant -> bits 0
    lens = np.array([n, n, n, n // 2 + 3], np.int64)
    enc = BlockEncoder(pallas=True).encode_int_blocks(x, lens=lens)
    for i in range(4):
        payload, mn, bits_i = spec.encode_int_block(x[i, :lens[i]])
        assert enc.payloads[i] == payload, i
        assert (int(enc.mins[i]), int(enc.bits[i])) == (mn, bits_i), i


def test_fused_uniform_decode_bit_identical():
    """The fully fused uniform-dither decode (counter hash in-kernel,
    interpret mode) == the XLA path bitwise, in both the per-block
    (t_g=128) and multi-block-per-instance (t_g=8) kernel variants
    (the production DEFAULT read mode, ref go/group.go:299-310)."""
    from minnow_tpu.ops import codec, pallas_codec

    rng = np.random.default_rng(51)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    pixels = 250000
    for t_g, bsz in ((8, 5), (128, 2)):
        n = 32 * g * t_g
        vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
        words = np.stack([
            bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
            for v in vals])
        mins = rng.integers(-3, 3, bsz).astype(np.int64)
        low = rng.uniform(-10, 0, bsz).astype(np.float32)
        high = (low + rng.uniform(100, 300, bsz)).astype(np.float32)
        pix = np.full(bsz, pixels, np.int64)
        per = np.arange(bsz) != 1
        ids = np.arange(10, 10 + bsz, dtype=np.int64)
        ref = np.asarray(codec.decode_float_blocks32(
            words, mins, low, high, pix, per, ids, bits, n,
            dither="uniform", seed=9))
        k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, 9))
        got = np.asarray(pallas_codec.decode_float_pallas_group(
            words.reshape(-1, g * bits), mins, low, high, pix, per,
            bits, n, dither="uniform", interpret=True,
            key1=k1, key2=k2)).reshape(bsz, n)
        np.testing.assert_array_equal(ref.view(np.uint32),
                                      got.view(np.uint32),
                                      err_msg="t_g=%d" % t_g)


def test_device_reader_uniform_fused_matches_xla(tmp_path):
    """minh bulk read with dither="uniform" through the fused kernel
    fast path (interpret mode) equals the XLA decode exactly, at a
    ragged (padded) block length."""
    from minnow_tpu.formats import device_common, minh as minh_mod
    from minnow_tpu.formats import minh_device

    rng = np.random.default_rng(53)
    n = 16384 + 1024  # pads to 2*16384 under the 18-bit alignment
    cols = [minh_mod.Column(type=minh_mod.Float, low=0.0, high=250.0,
                            dx=0.001)]
    fname = str(tmp_path / "u.minh")
    w = minh_mod.create(fname)
    w.header(["x"], "", cols)
    w.geometry(250.0, 0, 0)
    for _ in range(2):
        w.block([rng.uniform(0, 249.9, n).astype(np.float32)])
    w.close()

    r = minh_mod.open(fname, dither="uniform", seed=4)
    try:
        device_common.INTERPRET = True
        got = minh_device.read_floats(r, ["x"], dither="uniform",
                                      seed=4)["x"]
    finally:
        device_common.INTERPRET = False
    xla = minh_device.read_floats(r, ["x"], dither="uniform",
                                  seed=4)["x"]
    r.close()
    np.testing.assert_array_equal(got.view(np.uint32),
                                  xla.view(np.uint32))


def test_dither_hash_stream_quality():
    """The counter-hash dither stream: uniform marginals, no visible
    serial correlation, distinct streams across blocks, determinism."""
    from minnow_tpu.ops import codec

    ids = np.arange(4, dtype=np.int64)
    k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, 0))
    n = 1 << 16
    c = np.arange(n, dtype=np.uint32)
    us = np.stack([np.asarray(codec.dither_hash_u(
        c, np.uint32(k1[b]), np.uint32(k2[b]))) for b in range(4)])
    assert (us >= 0).all() and (us < 1).all()
    # uniform marginals: mean 0.5 +- 4 sigma, var 1/12
    se = 1 / np.sqrt(12 * n)
    assert np.abs(us.mean(axis=1) - 0.5).max() < 4 * se
    assert np.abs(us.var(axis=1) - 1 / 12).max() < 0.002
    # serial correlation ~ 0
    for b in range(4):
        x = us[b] - us[b].mean()
        r1 = (x[:-1] * x[1:]).mean() / x.var()
        assert abs(r1) < 0.02, r1
    # blocks decorrelated (not translated copies)
    for a in range(4):
        for b in range(a + 1, 4):
            xa = us[a] - us[a].mean()
            xb = us[b] - us[b].mean()
            rab = (xa * xb).mean() / np.sqrt(xa.var() * xb.var())
            assert abs(rab) < 0.02, (a, b, rab)
    # deterministic
    again = np.asarray(codec.dither_hash_u(
        c, np.uint32(k1[0]), np.uint32(k2[0])))
    np.testing.assert_array_equal(us[0], again)
