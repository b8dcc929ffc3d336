"""Device-side (JAX/XLA) codec transforms.

Batched, mask-based equivalents of the per-block reference loops:

* float32 quantization ``q = floor(f32(x - low) / dx)``
  (ref go/group.go:312-320) -- all arithmetic pinned to float32,
* the periodic recentering of ref go/group.go:321-324, using the exact
  one-pass reduction derived in core/spec.py:periodic_min_fast (the
  sequential greedy scan is provably equal for in-range inputs; blocks the
  reduction flags invalid fall back to the host scan),
* per-block min-subtraction and delta statistics (ref go/group.go:242-255),
* dequantization with deterministic threefry dither
  (ref go/group.go:299-310).

All functions take a batch of blocks ``(B, N)`` with a per-block valid
length ``n`` (padding is masked out of every statistic and packs as zero
bits, which is byte-compatible with the unpadded stream).  Shapes are
static under jit; the data-dependent pack width is resolved by bucketing
in parallel/pipeline.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import bitpack

__all__ = [
    "quantize",
    "dequantize",
    "bits_needed",
    "periodic_distance",
    "bound",
    "prepare_int_blocks",
    "prepare_float_blocks",
    "decode_int_blocks",
    "decode_float_blocks",
]

_I64_MAX = np.int64(2**63 - 1)
_I64_MIN = np.int64(-(2**63))


def _div32_exact(a, b):
    """IEEE-correctly-rounded float32 division.

    XLA lowers f32 division to a reciprocal approximation (measured: 2 ulp
    off on ~34% of operands on the CPU backend), which breaks byte-exact
    quantization at pixel boundaries.  Per Figueroa's double-rounding
    theorem, dividing in float64 (>= 2p+2 bits) and casting back yields
    exactly the IEEE f32 quotient.  Validated bitwise against numpy in
    ops/validate.py (run on every backend the codec targets)."""
    return (a.astype(jnp.float64) / b.astype(jnp.float64)).astype(
        jnp.float32)


def _dx32(low, high, pixels):
    """dx = f32(high - low) / f32(pixels), both ops IEEE
    (ref go/group.go:316)."""
    return _div32_exact(high - low,
                        jnp.asarray(pixels).astype(jnp.float32))


def quantize(x, low, high, pixels):
    """float32 -> int64 pixel indices (ref go/group.go:312-320).  ``low``,
    ``high`` are float32 scalars (or (B,1) columns), ``pixels`` int64."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    dx = _dx32(low, high, pixels)
    q32 = _div32_exact(x.astype(jnp.float32) - low, dx)
    return jnp.floor(q32).astype(jnp.int64)


def dequantize(q, low, high, pixels, u=None):
    """int64 pixels -> float32 with dither ``u`` in [0,1)
    (ref go/group.go:299-310): ``out = dx*f32(q+u) + low``.

    With ``u=None`` (mode "none") this is bit-identical to the host
    reader.  Dithered device modes compute ``q+u`` in float32 (TPU f64 is
    not reliably available); the decoded-value contract ``|x-x_hat|<=dx``
    is unaffected, and dither streams are device/host-specific by design
    (core/dither.py)."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    dx = _dx32(low, high, pixels)
    if u is None:
        v32 = q.astype(jnp.float32)
    else:
        v32 = q.astype(jnp.float32) + u.astype(jnp.float32)
    # barrier: dx*v32 + low must round twice (mul, then add) -- an FMA
    # contraction would change the decoded bits vs the host reader
    prod = jax.lax.optimization_barrier(dx * v32)
    return prod + low


def bits_needed(max_delta):
    """Exact bit length of a uint64 (= spec.precision_needed).  Equals the
    reference's float64 ``ceil(log2(max+1))`` for all max < ~2**47
    (ref go/bit/bit.go:19-21; divergence documented in core/spec.py)."""
    max_delta = max_delta.astype(jnp.uint64)
    ks = jnp.arange(64, dtype=jnp.uint64)
    return jnp.sum((max_delta[..., None] >> ks) != 0, axis=-1).astype(
        jnp.int64)


def periodic_distance(x, x0, pixels):
    """Vectorized signed circular distance (ref go/group.go:412-420)."""
    d = x - x0
    return jnp.where(
        d >= 0,
        jnp.where(d > pixels - d, d - pixels, d),
        jnp.where(d < -(d + pixels), pixels + d, d),
    )


def bound(x, minimum, pixels):
    """Wrap into [minimum, minimum+pixels) by a single +-pixels step
    (ref go/group.go:374-382)."""
    x = x + jnp.where(x < minimum, pixels, 0)
    return x - jnp.where(x >= minimum + pixels, pixels, 0)


def _mask(n, width):
    return jax.lax.broadcasted_iota(jnp.int64, (1, width), 1) < n[:, None]


def _masked_min(x, mask):
    return jnp.where(mask, x, _I64_MAX).min(axis=1)


def _masked_max(x, mask):
    return jnp.where(mask, x, _I64_MIN).max(axis=1)


def _delta_stats(q, mask):
    """Min-subtraction with int64 wraparound, padding packed as zero
    (ref go/group.go:242-255)."""
    mn = _masked_min(q, mask)
    deltas = jnp.where(mask, q - mn[:, None], 0).astype(jnp.uint64)
    maxd = jnp.where(mask, deltas, 0).max(axis=1)
    return deltas, mn, maxd


@jax.jit
def prepare_int_blocks(x, n):
    """Batched int-block encode prep: ``x`` (B, N) int64, ``n`` (B,) valid
    lengths.  Returns ``(deltas u64 (B,N), mins (B,), maxdeltas (B,))``."""
    mask = _mask(n, x.shape[1])
    return _delta_stats(x, mask)


@partial(jax.jit, static_argnames=("clamp_q",))
def prepare_float_blocks(x, low, high, pixels, n, periodic,
                         clamp_q: bool = False):
    """Batched float-block encode prep (ref go/group.go:312-327).

    ``x`` (B, N) float32; ``low``/``high`` float32 (B,); ``pixels`` int64
    (B,); ``n`` (B,) valid lengths; ``periodic`` bool (B,).

    Returns ``(deltas u64, mins, maxdeltas, valid)`` -- ``valid[b]`` False
    when block b contains out-of-range pixels so the one-pass periodic
    reduction does not apply and the caller must use the host scan.
    """
    b, width = x.shape
    mask = _mask(n, width)
    q = quantize(x, low[:, None], high[:, None], pixels[:, None])
    if clamp_q:
        # guard against the reference's q == pixels wrap bug for
        # non-periodic data (see core/spec.py:encode_float_block)
        q = jnp.minimum(q, pixels[:, None] - 1)

    p = pixels[:, None]
    in_range = jnp.where(mask, (q >= 0) & (q < p), True).all(axis=1)

    x0 = q[:, :1]
    y = periodic_distance(q, x0, p)
    ymin = _masked_min(y, mask)
    ymax = _masked_max(y, mask)
    w = ymax - ymin + 1
    m = x0[:, 0] + ymin
    m = jnp.where(m < 0, m + pixels, m)
    m = jnp.where(w > pixels // 2, 0, m)

    qb = jnp.where(periodic[:, None], bound(q, m[:, None], p), q)
    deltas, mn, maxd = _delta_stats(qb, mask)
    valid = in_range | ~periodic
    return deltas, mn, maxd, valid


@partial(jax.jit, static_argnames=("bits", "n"))
def decode_int_blocks(words, mins, bits: int, n: int):
    """Batched int-block decode: (B, W) words -> (B, n) int64
    (ref go/group.go:257-263)."""
    deltas = bitpack.unpack_batch(words, bits, n)
    return deltas.astype(jnp.int64) + mins[:, None]


@partial(jax.jit, static_argnames=("bits", "n", "dither"))
def decode_float_blocks(words, mins, low, high, pixels, periodic,
                        block_ids, bits: int, n: int,
                        dither: str = "none", seed: int = 0):
    """Batched float-block decode (ref go/group.go:299-310).

    Device dither: threefry keyed on ``(seed, block_id)`` -- deterministic,
    uniform float32 in [0,1).  Modes ``none``/``midpoint`` are bit-identical
    to the host reader.
    """
    q = decode_int_blocks(words, mins, bits, n)
    p = pixels[:, None]
    q = jnp.where(periodic[:, None], bound(q, 0, p), q)
    if dither == "none":
        u = None
    elif dither == "midpoint":
        u = jnp.full(q.shape, 0.5)
    elif dither == "uniform":
        base = jax.random.PRNGKey(seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(block_ids)
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (n,), dtype=jnp.float32))(keys)
    else:
        raise ValueError("unknown dither mode %r" % dither)
    return dequantize(q, low[:, None], high[:, None], p, u)
