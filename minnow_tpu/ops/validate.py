"""Backend numeric-exactness validation.

The on-disk format is defined by IEEE float32 arithmetic (core/spec.py);
this module proves, at runtime on the *actual* backend, that the device
codec reproduces it bitwise.  Run by bench.py on the real chip and by the
test suite on the CPU mesh; any mismatch is a hard failure of the
byte-exactness contract, not a tolerance issue.

Found and guarded so far:

* XLA f32 division is reciprocal-approximated (2 ulp): codec divides in
  f64 and casts back (exact by Figueroa's double-rounding theorem).
* FMA contraction of ``dx*v + low`` would merge two roundings into one:
  codec puts an optimization barrier after the multiply.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import spec
from . import codec


def _rand_f32(rng, n, lo, hi):
    return rng.uniform(lo, hi, n).astype(np.float32)


def validate_quantize(n: int = 200_000, seed: int = 0) -> None:
    """Device quantize == host spec quantize, bit for bit, on random and
    boundary-adversarial inputs.  Always through jit: fusion rewrites
    (FMA contraction, division demotion) only happen in compiled code."""
    import jax

    rng = np.random.default_rng(seed)
    jq = jax.jit(codec.quantize)

    # random configs
    for low, high, dx in [(0.0, 250.0, 0.001), (-50.0, 100.0, 1.0),
                          (0.0, 1.0, 1 / 7), (1.0, 5.0, 1e-4),
                          (5.0, 16.0, 0.001)]:
        pixels = spec.float_group_pixels(low, high, dx)
        x = _rand_f32(rng, n, low, high)
        want = spec.quantize(x, low, high, pixels)
        got = np.asarray(jq(
            x, np.float32(low), np.float32(high), np.int64(pixels)))
        bad = np.nonzero(got != want)[0]
        if bad.size:
            raise AssertionError(
                "device quantize diverges from spec: %d/%d mismatches, "
                "first at x=%.9g (want %d got %d) [low=%g high=%g px=%d]"
                % (bad.size, n, x[bad[0]], want[bad[0]], got[bad[0]],
                   low, high, pixels))

    # adversarial: values engineered one ulp around every pixel boundary
    low, high, pixels = np.float32(0), np.float32(1), 4093
    dxq = spec.quantize_dx(low, high, pixels)
    ks = rng.integers(1, pixels, 50_000)
    grid = (ks.astype(np.float32) * dxq).astype(np.float32)
    x = np.concatenate([np.nextafter(grid, -np.inf), grid,
                        np.nextafter(grid, np.inf)])
    want = spec.quantize(x, low, high, pixels)
    got = np.asarray(jq(x, low, high, np.int64(pixels)))
    if not np.array_equal(got, want):
        bad = np.nonzero(got != want)[0]
        raise AssertionError(
            "device quantize diverges at pixel boundaries: %d mismatches "
            "(e.g. x=%.9g want %d got %d)" % (bad.size, x[bad[0]],
                                              want[bad[0]], got[bad[0]]))


def validate_dequantize(n: int = 200_000, seed: int = 1) -> None:
    """Device dequantize (dither=none) == host spec, bit for bit.
    Through jit (see validate_quantize); the (5, 16, 0.001) config with
    q=6276 is the FMA-contraction regression case."""
    import jax

    rng = np.random.default_rng(seed)
    jd = jax.jit(lambda q, lo, hi, p: codec.dequantize(q, lo, hi, p))
    for low, high, dx in [(0.0, 250.0, 0.001), (-50.0, 100.0, 0.25),
                          (5.0, 16.0, 0.001)]:
        pixels = spec.float_group_pixels(low, high, dx)
        q = rng.integers(0, pixels, n)
        q[0] = min(6276, pixels - 1)
        want = spec.dequantize(q, low, high, pixels)
        got = np.asarray(jd(
            jnp.asarray(q), np.float32(low), np.float32(high),
            np.int64(pixels)))
        if pixels <= (1 << 24):
            j24 = jax.jit(lambda q, lo, hi, p: codec.dequantize24(
                q.astype(jnp.int32), lo, hi, p))
            got24 = np.asarray(j24(
                jnp.asarray(q), np.float32(low), np.float32(high),
                np.int64(pixels)))
            bad = np.nonzero(got24.view(np.int32)
                             != want.view(np.int32))[0]
            if bad.size:
                raise AssertionError(
                    "dequantize24 diverges from spec: %d mismatches "
                    "(e.g. q=%d want %.9g got %.9g)"
                    % (bad.size, q[bad[0]], want[bad[0]], got24[bad[0]]))
        if not np.array_equal(got.view(np.int32), want.view(np.int32)):
            bad = np.nonzero(got.view(np.int32) != want.view(np.int32))[0]
            raise AssertionError(
                "device dequantize diverges from spec: %d mismatches "
                "(likely FMA contraction; e.g. q=%d want %.9g got %.9g)"
                % (bad.size, q[bad[0]], want[bad[0]], got[bad[0]]))


def validate_quantize_fast(seed: int = 3) -> None:
    """Integer-exact fast quantize (ops/fastdiv.py) == spec, bitwise,
    through jit, incl. pixel-boundary adversarial values."""
    import jax

    from . import fastdiv

    rng = np.random.default_rng(seed)
    jq = jax.jit(fastdiv.quantize_fast)
    for low, high, dx in [(0.0, 250.0, 0.001), (-50.0, 100.0, 1.0),
                          (5.0, 16.0, 0.001), (0.0, 1.0, 1 / 7)]:
        pixels = spec.float_group_pixels(low, high, dx)
        dxq = spec.quantize_dx(low, high, pixels)
        b, eb, m0, m1, ok = fastdiv.divisor_magic(np.array([dxq]))
        assert ok[0]
        x = _rand_f32(rng, 100_000, low, high)
        ks = rng.integers(0, pixels, 20_000)
        grid = np.float32(low) + (ks.astype(np.float32) * dxq).astype(
            np.float32)
        x = np.concatenate([x, np.nextafter(grid, -np.inf), grid,
                            np.nextafter(grid, np.inf)])
        diff = (x - np.float32(low)).astype(np.float32)
        q, exact = jq(diff, b[0], eb[0], m0[0], m1[0])
        q, exact = np.asarray(q), np.asarray(exact)
        # flagged elements (e.g. subnormal diffs -> quotient < 2^-120)
        # legitimately route to the host fallback; the adversarial grid
        # deliberately includes such values, so only sanity-bound the rate
        frac_flagged = (~exact).mean()
        if frac_flagged > 0.25:
            raise AssertionError("fast quantize certified too few "
                                 "elements (%.3f%% flagged)"
                                 % (100 * frac_flagged))
        want = spec.quantize(x, low, high, pixels)
        bad = np.nonzero((q != want) & exact)[0]
        if bad.size:
            raise AssertionError(
                "fast quantize diverges from spec: %d mismatches (e.g. "
                "x=%a want %d got %d) [low=%g high=%g dx=%g]"
                % (bad.size, float(x[bad[0]]), want[bad[0]], q[bad[0]],
                   low, high, dx))


def validate_pack(seed: int = 2) -> None:
    """Device pack bytes == spec pack bytes for a sample of widths."""
    from . import bitpack

    rng = np.random.default_rng(seed)
    for bits in (1, 7, 11, 18, 23, 32, 45, 64):
        x = rng.integers(0, 2**63, 4097, dtype=np.int64).view(np.uint64)
        want = spec.pack_bits(x, bits)
        got = bitpack.words_to_bytes(bitpack.pack(x, bits), bits, len(x))
        if got != want:
            raise AssertionError("device pack diverges at bits=%d" % bits)
        back = np.asarray(bitpack.unpack(
            bitpack.bytes_to_words(want, bits, len(x)), bits, len(x)))
        mask = np.uint64(0xFFFFFFFFFFFFFFFF) if bits >= 64 \
            else np.uint64((1 << bits) - 1)
        if not np.array_equal(back, x & mask):
            raise AssertionError("device unpack diverges at bits=%d" % bits)


def validate_pallas_encode(seed: int = 4, interpret: bool = False) -> None:
    """Fused Pallas encode kernel (ops/pallas_encode.py) == host spec,
    byte for byte, on the actual backend (the production BlockEncoder
    auto-selects this kernel on TPU).  Covers a periodic wrap cluster
    and verifies the stats the fallback logic keys on."""
    from . import bitpack, fastdiv, pallas_encode

    rng = np.random.default_rng(seed)
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    bits, bsz, n = 18, 4, 4096
    x = rng.uniform(0, 249.9, (bsz, n)).astype(np.float32)
    wrap = np.concatenate([rng.uniform(0, 3, n // 2),
                           250.0 - rng.uniform(0, 3, n - n // 2)])
    x[2] = wrap.astype(np.float32)
    lowv = np.full(bsz, low, np.float32)
    pixv = np.full(bsz, pixels, np.int64)
    per = np.ones(bsz, bool)
    dxq = np.full(bsz, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()
    words, mins, maxd, valid = (np.asarray(a) for a in
                                pallas_encode.encode_float_pallas(
        x, lowv, db, deb, dm0, dm1, pixv, per, bits, n,
        interpret=interpret))
    if not valid.all():
        raise AssertionError("pallas encode failed to certify "
                             "in-range blocks")
    for i in range(bsz):
        payload, mn, bts, _ = spec.encode_float_block(x[i], low, high,
                                                      pixels)
        if mins[i] != mn or spec.precision_needed(int(maxd[i])) != bts:
            raise AssertionError(
                "pallas encode stats diverge at block %d "
                "(min %d want %d, bits %d want %d)"
                % (i, mins[i], mn,
                   spec.precision_needed(int(maxd[i])), bts))
        if bts == bits and \
                bitpack.words_to_bytes(words[i], bits, n) != payload:
            raise AssertionError(
                "pallas encode payload diverges from spec at block %d"
                % i)


def validate_pallas_group(seed: int = 5, interpret: bool = False) -> None:
    """Group-aligned Pallas kernels (ops/pallas_codec.py *_group,
    ops/pallas_encode.encode_float_pallas_group) == host spec / XLA
    decode, byte for byte, on the actual backend.  These are the
    production TPU fast paths for bulk decode and streamed encode."""
    from . import bitpack, codec, fastdiv, pallas_codec, pallas_encode

    rng = np.random.default_rng(seed)

    # unpack: one width per structural class the kernel compiles
    # differently -- _tile_step(bits) in {1, 2, 4, 8} x group size G
    # (even widths always group at G=64, odd at 128) -- plus the 1/32
    # edges (production engages DATA-determined widths, so each class
    # must be gated, not just the flagship width; one per class keeps
    # the remote-compile budget bounded)
    for bits in (18, 13, 1, 32, 12):
        g = pallas_codec.group_tiles(bits)
        n = 32 * g * 8
        vals = rng.integers(0, 1 << bits, (3, n), dtype=np.uint64)
        words = np.stack([
            bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
            for v in vals])
        got = np.asarray(pallas_codec.unpack_pallas_group(
            words.reshape(-1, g * bits), bits, n, interpret=interpret))
        if not np.array_equal(got.reshape(3, n).astype(np.uint64), vals):
            raise AssertionError("group unpack diverges at bits=%d"
                                 % bits)

    # wide (33-64-bit) unpack + the fused int64 combine (ID columns):
    # same one-per-class coverage -- ts 8/4/2/1 over the reachable G
    for bits in (41, 64, 34, 36):
        g = pallas_codec.group_tiles(bits)
        n = 32 * g * 8
        hi_excl = (1 << bits) - 1 if bits == 64 else (1 << bits)
        vals = rng.integers(0, hi_excl, (2, n), dtype=np.uint64)
        words = np.stack([
            bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
            for v in vals])
        mins = rng.integers(-100, 100, 2).astype(np.int64)
        ref = np.asarray(codec.decode_int_blocks(
            words, mins, bits, n))
        got = np.asarray(codec.decode_int_blocks_group(
            words.reshape(-1, g * bits), mins, bits, n,
            interpret=interpret))
        if not np.array_equal(ref, got):
            raise AssertionError("group int decode diverges at bits=%d"
                                 % bits)

    # fused decode vs the XLA decode, bitwise -- both kernel paths:
    # t_g=8 engages the multi-block-per-instance variant (kpb=4 here),
    # t_g=128 the per-block variant.  bits=11 adds a NON-flagship width
    # class (different _tile_step => a separately compiled Mosaic
    # program) to the on-chip gate: production widths are data-
    # determined, and width-specific Mosaic miscompiles have been
    # observed on real silicon (ADVICE r3 validate.py:310).
    for bits, t_g, bsz in ((18, 8, 4), (18, 128, 2), (11, 8, 4)):
        g = pallas_codec.group_tiles(bits)
        pixels = 250000 if bits == 18 else 2000
        n = 32 * g * t_g
        vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
        words = np.stack([
            bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
            for v in vals])
        mins = rng.integers(-3, 3, bsz).astype(np.int64)
        low = rng.uniform(-10, 0, bsz).astype(np.float32)
        high = (low + rng.uniform(100, 300, bsz)).astype(np.float32)
        pix = np.full(bsz, pixels, np.int64)
        per = np.arange(bsz) != 1  # mixed periodic in BOTH size cases
        ref = np.asarray(codec.decode_float_blocks32(
            words, mins, low, high, pix, per, np.arange(bsz), bits, n,
            dither="none"))
        got = np.asarray(pallas_codec.decode_float_pallas_group(
            words.reshape(-1, g * bits), mins, low, high, pix, per,
            bits, n, dither="none", interpret=interpret))
        if not np.array_equal(ref.view(np.uint32),
                              got.reshape(bsz, n).view(np.uint32)):
            raise AssertionError("group fused decode diverges from XLA "
                                 "decode at t_g=%d" % t_g)

        # uniform dither (the production DEFAULT read mode): both the
        # composite (kernel unpack + XLA dither tail) and the fully
        # fused in-kernel counter-hash path vs the all-XLA path,
        # bitwise -- incl. the pad-and-slice at a ragged n
        n_true = n - 7
        ref_u = np.asarray(codec.decode_float_blocks32(
            words[:, :max(bitpack.words_per_block(bits, n_true), 1)],
            mins, low, high, pix, per, np.arange(bsz), bits, n_true,
            dither="uniform", seed=3))
        got_u = np.asarray(codec.decode_float_blocks32_group(
            words.reshape(-1, g * bits), mins, low, high, pix, per,
            np.arange(bsz), bits, n_true, n, seed=3,
            interpret=interpret))
        if not np.array_equal(ref_u.view(np.uint32),
                              got_u.view(np.uint32)):
            raise AssertionError("group uniform decode diverges from "
                                 "XLA decode at t_g=%d" % t_g)
        k1, k2 = codec.dither_keys(np.arange(bsz, dtype=np.int64), 3)
        fused_u = np.asarray(pallas_codec.decode_float_pallas_group(
            words.reshape(-1, g * bits), mins, low, high, pix, per,
            bits, n, dither="uniform", interpret=interpret,
            key1=np.asarray(k1), key2=np.asarray(k2)))
        fused_u = fused_u.reshape(bsz, n)[:, :n_true]
        if not np.array_equal(ref_u.view(np.uint32),
                              fused_u.view(np.uint32)):
            raise AssertionError("fused uniform decode diverges from "
                                 "XLA decode at t_g=%d" % t_g)
    bits = 18  # encode check runs at the flagship width
    g = pallas_codec.group_tiles(bits)
    n, bsz = 32 * g * 8, 4

    # fused group encode vs host spec bytes
    lowf, highf, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(lowf, highf, dx)
    x = rng.uniform(0, 249.9, (bsz, n)).astype(np.float32)
    wrap = np.concatenate([rng.uniform(0, 3, n // 2),
                           250.0 - rng.uniform(0, 3, n - n // 2)])
    x[2] = wrap.astype(np.float32)
    lowv = np.full(bsz, lowf, np.float32)
    pixv = np.full(bsz, pixels, np.int64)
    perv = np.ones(bsz, bool)
    dxq = np.full(bsz, spec.quantize_dx(lowf, highf, pixels),
                  np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()
    words, mn_, maxd, valid = (np.asarray(a) for a in
                               pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=interpret))
    # explicit rows disables block merging: the kpb=1 kernel path must
    # produce the same words
    w1, mn1, _, _ = (np.asarray(a) for a in
                     pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=interpret, rows=8))
    if not (np.array_equal(w1, words) and np.array_equal(mn1, mn_)):
        raise AssertionError("group encode kpb=1 and merged paths "
                             "disagree")

    # column-constant specialization: identical output words/stats
    # (this on-chip pass is what lets production enable const_cfg)
    cfg = pallas_encode.make_const_cfg(lowf, db, deb, dm0, dm1,
                                       pixels, True)
    wc, mnc, maxdc, vc = (np.asarray(a) for a in
                          pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=interpret, const_cfg=cfg))
    if not (np.array_equal(wc, words) and np.array_equal(mnc, mn_)
            and np.array_equal(maxdc, maxd)
            and np.array_equal(vc, valid)):
        raise AssertionError("const-specialized group encode diverges "
                             "from the generic kernel")

    # the big-block two-dispatch encode (XLA stats + stateless pack
    # kernel) must produce the same words and stats as the fused kernel
    wb, mnb, maxdb, vb = (np.asarray(a) for a in
                          pallas_encode.encode_float_pallas_bigblock(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=interpret))
    if not (np.array_equal(wb, words) and np.array_equal(mnb, mn_)
            and np.array_equal(maxdb, maxd) and vb.all()):
        raise AssertionError("big-block two-dispatch encode diverges "
                             "from the fused kernel")
    if not valid.all():
        raise AssertionError("group encode failed to certify in-range "
                             "blocks")
    words = words.reshape(bsz, (n // 32) * bits)
    for i in range(bsz):
        payload, mn, bts, _ = spec.encode_float_block(x[i], lowf, highf,
                                                      pixels)
        if mn_[i] != mn or spec.precision_needed(int(maxd[i])) != bts:
            raise AssertionError("group encode stats diverge at block "
                                 "%d" % i)
        if bts == bits and \
                bitpack.words_to_bytes(words[i], bits, n) != payload:
            raise AssertionError("group encode payload diverges from "
                                 "spec at block %d" % i)


def validate_backend() -> dict:
    """Run all exactness checks on the current default backend.  Returns a
    small report dict; raises AssertionError on any divergence."""
    import jax

    validate_quantize()
    validate_quantize_fast()
    validate_dequantize()
    validate_pack()
    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "exact": True,
    }
    if report["backend"] == "tpu":
        # gate the fused kernels the production paths auto-select on
        # this backend (CPU runs cover them in interpret mode via the
        # test suite).  A kernel-path failure does NOT raise: it is
        # recorded so the caller can disable that path (env kill
        # switches MINNOW_TPU_PALLAS_ENCODE/DECODE=0) and proceed with
        # the XLA paths -- ``exact`` covers the core (XLA/host) codec
        # only.  bench.py reacts accordingly.
        for name, fn in (("pallas_encode", validate_pallas_encode),
                         ("pallas_group", validate_pallas_group)):
            try:
                fn()
                report[name] = True
            except Exception as e:  # noqa: BLE001 - recorded, path disabled
                report[name] = "FAILED: %s" % str(e)[:300]
    return report
