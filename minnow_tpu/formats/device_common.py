"""Shared device-read fast path: bulk float decode through the
group-aligned fused Pallas kernel (ops/pallas_codec.py), used by the
minh and minp device readers.

ONE HBM pass instead of the XLA path's transpose round-trips; blocks are
padded up to the kernel's 32*G*8 alignment (zero words decode to garbage
rows that are sliced off).  Bit-identity with the XLA path is gated
on-chip by ops/validate.validate_pallas_group.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["group_decode", "group_decode_ints"]

# tests flip this to exercise the Pallas group path in interpret mode on
# the CPU backend (production: real-kernel on TPU only)
INTERPRET = False


def _enabled() -> bool:
    """Kill switch: MINNOW_TPU_PALLAS_DECODE=0 forces the XLA read path
    (bench.py sets it when on-chip validation fails a kernel path)."""
    return os.environ.get("MINNOW_TPU_PALLAS_DECODE", "") != "0"


def _aligned_words2d(words, bits, n):
    """Shared geometry of the group fast paths: pad the (B, W) word rows
    up to the kernel's 32*G*8 alignment and return
    ``(words2d (B*t/G, G*bits), n_pad)``, or None when the padding
    waste would eat the kernel's win -- rejects n < align (waste >=
    100%) and lengths just past an alignment boundary (e.g. n = align+1
    would decode ~2x the data; bound: n_pad <= 1.25 * n)."""
    from ..ops import pallas_codec

    G = pallas_codec.group_tiles(bits)
    align = 32 * G * 8
    n_pad = -(-n // align) * align
    supported = pallas_codec.supported_group64 if bits > 32 \
        else pallas_codec.supported_group
    if n_pad * 4 > n * 5 or not supported(bits, n_pad):
        return None
    w_pad = (n_pad // 32) * bits
    if words.shape[1] < w_pad:
        words = np.pad(words, ((0, 0), (0, w_pad - words.shape[1])))
    t_g = (n_pad // 32) // G
    return words[:, :w_pad].reshape(len(words) * t_g, G * bits), n_pad


def group_decode(words, mins, lows, highs, pixels, periodic, bits, n,
                 dither, block_ids=None, seed=0):
    """(B, W) words -> (B, n) float32 via the group kernel, or None when
    the shape/backend/dither doesn't qualify (caller falls back to the
    XLA path).

    All three modes run fully fused in the kernel; ``uniform`` (the
    default read mode) computes the counter-hash dither stream
    (codec.dither_hash_u) in-kernel, bit-identical to the XLA path.
    Requires ``block_ids`` (the dither keys)."""
    if not _enabled():
        return None
    if dither == "uniform":
        if block_ids is None:
            return None
    elif dither not in ("none", "midpoint"):
        return None
    import jax

    if jax.default_backend() != "tpu" and not INTERPRET:
        return None
    from ..ops import codec, pallas_codec, selfcheck

    # cheap eligibility first: non-qualifying reads must not pay the
    # one-shot self-check's compile cost for a path they can't use
    if not (0 < bits <= 32 and pixels.max() < (1 << 24)):
        return None
    geo = _aligned_words2d(words, bits, n)
    if geo is None:
        return None
    if not selfcheck.kernel_ok("decode", interpret=INTERPRET):
        return None
    words2d, n_pad = geo
    if dither == "uniform":
        # fully fused: the counter-hash dither (codec.dither_hash_u)
        # runs inside the kernel; only the per-block keys (full
        # threefry fold_in) come from XLA.  Bit-identical to the XLA
        # decode_float_blocks32(dither="uniform") path.  Own self-check
        # family: a hash divergence falls back without disabling the
        # none/midpoint kernel paths.
        if not selfcheck.kernel_ok("decode_uniform",
                                   interpret=INTERPRET):
            return None
        k1, k2 = (np.asarray(k) for k in codec.dither_keys(
            np.asarray(block_ids, np.int64), int(seed)))
        dec = _run_kernel(lambda: pallas_codec.decode_float_pallas_group(
            words2d, mins, lows, highs, pixels, periodic, int(bits),
            int(n_pad), dither="uniform", interpret=INTERPRET,
            key1=k1, key2=k2))
        if dec is None:
            return None
        return dec.reshape(len(words), n_pad)[:, :n]
    dec = _run_kernel(lambda: pallas_codec.decode_float_pallas_group(
        words2d, mins, lows, highs, pixels, periodic, int(bits),
        int(n_pad), dither=dither, interpret=INTERPRET))
    if dec is None:
        return None
    return dec.reshape(len(words), n_pad)[:, :n]


def _run_kernel(fn):
    """Run a kernel call; fall back to the XLA path (None) on COMPILE
    or resource failures only.  The selfcheck gates certify the kernels
    at canonical shapes, but Mosaic's VMEM budget can reject an unusual
    (width, block-length) combination the canonical shapes never hit --
    a bulk read must degrade, not crash.  Genuine kernel exceptions
    (assertion/shape bugs) still propagate."""
    try:
        return np.asarray(fn())
    except Exception as e:  # noqa: BLE001 - classified below
        msg = str(e)
        if ("remote_compile" in msg or "Mosaic" in msg
                or "vmem" in msg.lower()
                or "RESOURCE_EXHAUSTED" in msg
                or "ResourceExhausted" in msg):
            return None
        raise


def group_decode_ints(words, mins, bits, n):
    """Bulk int decode through the group unpack kernels (u32 for
    widths <= 32, (lo, hi) halves for 33-64 -- covers ID columns), or
    None when the shape/backend doesn't qualify."""
    if not _enabled():
        return None
    import jax

    if jax.default_backend() != "tpu" and not INTERPRET:
        return None
    from ..ops import codec, selfcheck

    if not 0 < bits <= 64:
        return None
    geo = _aligned_words2d(words, bits, n)
    if geo is None:
        return None
    if not selfcheck.kernel_ok("decode", interpret=INTERPRET):
        return None
    words2d, n_pad = geo
    dec = np.asarray(codec.decode_int_blocks_group(
        words2d, mins, int(bits), int(n_pad), interpret=INTERPRET))
    return dec[:, :n]
