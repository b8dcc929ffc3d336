"""One-shot per-process self-certification of the Pallas kernel paths.

Production readers/encoders auto-select the fused Pallas kernels on the
TPU backend (parallel/pipeline.BlockEncoder, formats/device_common)
without requiring bench.py's full ``ops/validate.validate_backend`` run
to have happened in-process.  A Mosaic toolchain regression (a
miscompile class this repo has observed on real hardware — see
docs/STATUS.md "Mosaic miscompiles") would then silently corrupt
written files and bulk reads for any library/CLI user.

So: on the FIRST auto-selection of a kernel family in a process, run a
tiny spec-vs-kernel byte comparison on the live backend, cache the
verdict, and make the caller fall back to the (always-validated) XLA
path on failure.  Cost is a few small jit graphs per family, once per
process: sub-second on a warm persistent compile cache (kernel_ok
configures one via utils/backend_guard.ensure_compile_cache if the
user hasn't), but a cold cache on a remote-compile TPU setup pays
1-3 min per graph on first use -- ``MINNOW_TPU_PALLAS_SELFCHECK=0``
is the escape hatch if that latency is unacceptable.

``MINNOW_TPU_PALLAS_SELFCHECK=0`` skips the check (bench.py sets it
after running the full validation suite, which strictly subsumes these
representatives).
"""

from __future__ import annotations

import os
import threading
import warnings

import numpy as np

__all__ = ["kernel_ok", "reset"]

_VERDICTS: dict = {}
# serializes first-use checks: concurrent encoders (e.g. text_to_minh
# --device --jobs=N worker threads) must not each run the expensive
# check on a shared cache miss
_LOCK = threading.Lock()


def reset() -> None:
    """Clear cached verdicts (tests only)."""
    _VERDICTS.clear()


def _check_encode(interpret: bool) -> None:
    """Fused group encode at the flagship width == host spec bytes
    (representative of the family; full width coverage lives in
    ops/validate.validate_pallas_group and the test suite)."""
    from ..core import spec
    from . import bitpack, fastdiv, pallas_codec, pallas_encode

    rng = np.random.default_rng(11)
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    n, bsz = 32 * g * 8, 2
    x = rng.uniform(0.0, 249.9, (bsz, n)).astype(np.float32)
    lowv = np.full(bsz, low, np.float32)
    pixv = np.full(bsz, pixels, np.int64)
    perv = np.ones(bsz, bool)
    dxq = np.full(bsz, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()
    words, mins, maxd, valid = (
        np.asarray(a) for a in pallas_encode.encode_float_pallas_group(
            x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
            bits, n, interpret=interpret))
    assert valid.all(), "kernel failed to certify in-range blocks"
    words = words.reshape(bsz, (n // 32) * bits)
    for i in range(bsz):
        payload, mn, bts, _ = spec.encode_float_block(
            x[i], low, high, pixels)
        assert int(mins[i]) == mn \
            and spec.precision_needed(int(maxd[i])) == bts, \
            "kernel stats diverge from spec"
        assert bts != bits or \
            bitpack.words_to_bytes(words[i], bits, n) == payload, \
            "kernel payload bytes diverge from spec"

    # int-pack representatives: width 41 (the 33-64-bit limb planar
    # path) AND width 18 (the <= 32 lo-only kernel variant -- a
    # different code path that must be certified separately)
    for ibits in (41, 18):
        gi = pallas_codec.group_tiles(ibits)
        ni = 32 * gi * 8
        xi = rng.integers(0, 1 << (ibits - 1), (2, ni),
                          dtype=np.int64)
        xi[:, 0] = 0
        xi[:, 1] = (1 << ibits) - 1  # pin the true width
        mins_i = xi.min(axis=1)
        lens_i = np.full(2, ni, np.int64)
        words_i = np.asarray(pallas_encode.delta_pack_int_pallas(
            xi, mins_i, lens_i, ibits, ni, ni, interpret=interpret))
        for i in range(2):
            payload, mn, bts = spec.encode_int_block(xi[i])
            assert int(mins_i[i]) == mn
            assert bts == ibits
            assert bitpack.words_to_bytes(words_i[i], ibits, ni) == \
                payload, "int pack kernel bytes diverge from spec " \
                "(bits=%d)" % ibits


def _check_decode(interpret: bool) -> None:
    """Fused group decode + wide int decode at the flagship width ==
    XLA decode, bitwise (the XLA path itself is spec-gated by
    ops/validate on every backend)."""
    from ..core import spec
    from . import bitpack, codec, pallas_codec

    rng = np.random.default_rng(12)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    n, bsz = 32 * g * 8, 2
    pixels = 250000
    vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
    words = np.stack([
        bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
        for v in vals])
    mins = np.zeros(bsz, np.int64)
    low = np.zeros(bsz, np.float32)
    high = np.full(bsz, 250.0, np.float32)
    pix = np.full(bsz, pixels, np.int64)
    per = np.ones(bsz, bool)
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, np.arange(bsz), bits, n,
        dither="none"))
    got = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, g * bits), mins, low, high, pix, per, bits,
        n, dither="none", interpret=interpret))
    assert np.array_equal(ref.view(np.uint32),
                          got.reshape(bsz, n).view(np.uint32)), \
        "fused float decode diverges from the XLA path"
    got_i = np.asarray(codec.decode_int_blocks_group(
        words.reshape(-1, g * bits), mins, bits, n,
        interpret=interpret))
    ref_i = np.asarray(codec.decode_int_blocks(words, mins, bits, n))
    assert np.array_equal(got_i, ref_i), \
        "fused int decode diverges from the XLA path"
    # wide (33-64-bit) limb unpack: a distinct Mosaic surface that
    # group_decode_ints engages for ID columns -- must be certified too
    wbits = 41
    gw = pallas_codec.group_tiles(wbits)
    nw = 32 * gw * 8
    walvs = rng.integers(0, 1 << wbits, (2, nw), dtype=np.uint64)
    wwords = np.stack([
        bitpack.bytes_to_words(spec.pack_bits(v, wbits), wbits, nw)
        for v in walvs])
    wmins = rng.integers(-100, 100, 2).astype(np.int64)
    got_w = np.asarray(codec.decode_int_blocks_group(
        wwords.reshape(-1, gw * wbits), wmins, wbits, nw,
        interpret=interpret))
    ref_w = np.asarray(codec.decode_int_blocks(wwords, wmins, wbits,
                                               nw))
    assert np.array_equal(got_w, ref_w), \
        "wide limb unpack diverges from the XLA path"


def _check_decode_uniform(interpret: bool) -> None:
    """The DEFAULT read mode's fused in-kernel counter-hash dither: a
    separate family from plain decode -- its u32 multiplies are a
    distinct Mosaic surface from the unpack, and a divergence here must
    not disable the proven none/midpoint kernel paths."""
    from ..core import spec
    from . import bitpack, codec, pallas_codec

    rng = np.random.default_rng(13)
    bits = 18
    g = pallas_codec.group_tiles(bits)
    n, bsz = 32 * g * 8, 2
    pixels = 250000
    vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
    words = np.stack([
        bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
        for v in vals])
    mins = np.zeros(bsz, np.int64)
    low = np.zeros(bsz, np.float32)
    high = np.full(bsz, 250.0, np.float32)
    pix = np.full(bsz, pixels, np.int64)
    per = np.ones(bsz, bool)
    ids = np.arange(bsz, dtype=np.int64)
    ref_u = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, ids, bits, n,
        dither="uniform", seed=1))
    k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, 1))
    got_u = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, g * bits), mins, low, high, pix, per,
        bits, n, dither="uniform", interpret=interpret,
        key1=k1, key2=k2)).reshape(bsz, n)
    assert np.array_equal(ref_u.view(np.uint32),
                          got_u.view(np.uint32)), \
        "fused uniform decode diverges from the XLA path"


_CHECKS = {"encode": _check_encode, "decode": _check_decode,
           "decode_uniform": _check_decode_uniform}


def kernel_ok(family: str, interpret: bool = False) -> bool:
    """True iff the Pallas kernel ``family`` ("encode" | "decode" |
    "decode_uniform") passed its one-shot self-check on this backend in
    this process.  Failure is cached, warned once, and makes production
    auto-selection fall back to the XLA path."""
    if os.environ.get("MINNOW_TPU_PALLAS_SELFCHECK", "") == "0":
        return True
    key = (family, bool(interpret))
    verdict = _VERDICTS.get(key)
    if verdict is None:
        with _LOCK:
            verdict = _VERDICTS.get(key)
            if verdict is None:
                from ..utils import backend_guard

                backend_guard.ensure_compile_cache()
                try:
                    _CHECKS[family](interpret)
                    verdict = True
                except Exception as e:  # noqa: BLE001 - disables path
                    warnings.warn(
                        "minnow_tpu: Pallas %s kernel failed its "
                        "one-shot self-check on this backend; falling "
                        "back to the XLA path for this process (%s)"
                        % (family, str(e)[:200]),
                        RuntimeWarning, stacklevel=3)
                    verdict = False
                _VERDICTS[key] = verdict
    return verdict
