"""Word-parallel fixed-width bit packing for TPU (JAX/XLA).

The reference packs one element at a time through a 9-byte shuffle buffer
(ref go/bit/bit.go:100-131; python/cy_bit.pyx:15-96).  A TPU has no byte
addressing, so the stream is reformulated word-parallel:

* the byte stream is viewed as little-endian uint32 words;
* elements are processed in tiles of 32: a width-``b`` tile occupies
  exactly ``32*b`` bits = ``b`` words, so for fixed ``b`` the
  (element, word, shift) contribution pattern is static;
* packing a tile is an unrolled sequence of shift/OR ops, vectorized
  across all tiles (the tile axis is the vector axis) -- pure VPU work
  with no gathers, scatters or data-dependent control flow;
* 64-bit values travel as (lo, hi) uint32 pairs so the hot loop never
  needs emulated 64-bit arithmetic.

Bit layout matches the reference exactly: element ``i`` occupies bits
``[i*b, (i+1)*b)`` of the stream, LSB-first (ref go/bit/bit.go spec;
verified byte-for-byte against core/spec.py in tests/test_ops.py).

Functions are jit-specialized on the static width ``b`` (<= 64 variants,
cached compiles); blocks with different widths are bucketed by the
pipeline layer (parallel/pipeline.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spec

__all__ = [
    "words_per_block",
    "split_u64",
    "join_u64",
    "pack",
    "unpack",
    "pack_batch",
    "unpack_batch",
    "words_to_bytes",
    "bytes_to_words",
]

_TILE = 32


def words_per_block(bits: int, n: int) -> int:
    """uint32 words holding ``n`` elements at width ``bits``."""
    return (bits * n + 31) // 32


def split_u64(x):
    """uint64 (or int64) array -> (lo, hi) uint32 pair."""
    x = x.astype(jnp.uint64)
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def join_u64(lo, hi):
    """(lo, hi) uint32 pair -> uint64 array."""
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _masks(bits: int):
    lo_bits = min(bits, 32)
    lo_mask = np.uint32(0xFFFFFFFF if lo_bits >= 32 else (1 << lo_bits) - 1)
    hi_bits = max(bits - 32, 0)
    hi_mask = np.uint32(0xFFFFFFFF if hi_bits >= 32 else (1 << hi_bits) - 1)
    return lo_mask, hi_mask


def _pack_tiles(lo_t, hi_t, bits: int):
    """Pack (32, T) uint32 columns into (T, bits) words.

    ``lo_t[j]`` / ``hi_t[j]`` are the low/high halves of element ``j`` of
    every tile.  Static unrolled shifts, accumulated per word with a
    stacked sum-reduce: every contribution occupies disjoint bits, so
    OR == ADD, and a reduce avoids a measured Mosaic/XLA-TPU miscompile
    of long sequential shift-OR/ADD folds (bits 16-23 of 32-term chains
    are silently dropped; see tools/tpu_or_chain_repro.py).
    """
    t = lo_t.shape[1]
    lo_mask, hi_mask = _masks(bits)
    terms = [[] for _ in range(bits)]
    for j in range(_TILE):
        w, s = divmod(j * bits, 32)
        lj = lo_t[j] & lo_mask
        terms[w].append(lj << np.uint32(s) if s else lj)
        if s and s + min(bits, 32) > 32:
            terms[w + 1].append(lj >> np.uint32(32 - s))
        if bits > 32:
            hj = hi_t[j] & hi_mask
            terms[w + 1].append(hj << np.uint32(s) if s else hj)
            if s and s + (bits - 32) > 32:
                terms[w + 2].append(hj >> np.uint32(32 - s))
    words = [
        ts[0] if len(ts) == 1
        else jnp.sum(jnp.stack(ts, axis=0), axis=0, dtype=jnp.uint32)
        if ts else jnp.zeros((t,), jnp.uint32)
        for ts in terms
    ]
    return jnp.stack(words, axis=1)  # (T, bits), tile-major word order


def _unpack_tiles(words_t, bits: int):
    """Inverse of :func:`_pack_tiles`: (T, bits) words -> (lo, hi) of
    shape (32, T)."""
    lo_mask, hi_mask = _masks(bits)
    los, his = [], []
    for j in range(_TILE):
        w, s = divmod(j * bits, 32)
        lj = words_t[:, w] >> np.uint32(s) if s else words_t[:, w]
        if s and s + min(bits, 32) > 32:
            lj = lj | (words_t[:, w + 1] << np.uint32(32 - s))
        los.append(lj & lo_mask)
        if bits > 32:
            hj = words_t[:, w + 1] >> np.uint32(s) if s else words_t[:, w + 1]
            if s and s + (bits - 32) > 32:
                hj = hj | (words_t[:, w + 2] << np.uint32(32 - s))
            his.append(hj & hi_mask)
        else:
            his.append(jnp.zeros_like(lj))
    return jnp.stack(los, axis=0), jnp.stack(his, axis=0)


def _pack_1d(lo, hi, bits: int):
    """(N,) uint32 pair -> (words_per_block(bits, N),) uint32."""
    n = lo.shape[0]
    if bits == 0 or n == 0:
        return jnp.zeros((0,), jnp.uint32)
    pad = (-n) % _TILE
    if pad:
        lo = jnp.pad(lo, (0, pad))
        hi = jnp.pad(hi, (0, pad))
    t = (n + pad) // _TILE
    lo_t = lo.reshape(t, _TILE).T
    hi_t = hi.reshape(t, _TILE).T
    words = _pack_tiles(lo_t, hi_t, bits).reshape(t * bits)
    return words[: words_per_block(bits, n)]


def _unpack_1d(words, bits: int, n: int):
    """(W,) uint32 words -> (N,) (lo, hi) uint32 pair."""
    if bits == 0:
        z = jnp.zeros((n,), jnp.uint32)
        return z, z
    t = (n + _TILE - 1) // _TILE
    pad = t * bits - words.shape[0]
    if pad > 0:
        words = jnp.pad(words, (0, pad))
    lo_t, hi_t = _unpack_tiles(words.reshape(t, bits), bits)
    return lo_t.T.reshape(-1)[:n], hi_t.T.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("bits",))
def pack(x, bits: int):
    """Pack a uint64/int64 vector at static width ``bits`` into uint32
    stream words."""
    lo, hi = split_u64(x)
    return _pack_1d(lo, hi, bits)


@partial(jax.jit, static_argnames=("bits", "n"))
def unpack(words, bits: int, n: int):
    """Unpack ``n`` elements at width ``bits`` back into uint64."""
    lo, hi = _unpack_1d(words, bits, n)
    return join_u64(lo, hi)


@partial(jax.jit, static_argnames=("bits",))
def pack_batch(x, bits: int):
    """Pack each row of ``x`` (B, N) independently -> (B, W) words.
    Rows are independent streams (one per minnow block)."""
    lo, hi = split_u64(x)
    return jax.vmap(lambda a, b: _pack_1d(a, b, bits))(lo, hi)


@partial(jax.jit, static_argnames=("bits", "n"))
def unpack_batch(words, bits: int, n: int):
    """(B, W) words -> (B, n) uint64."""
    lo, hi = jax.vmap(lambda w: _unpack_1d(w, bits, n))(words)
    return join_u64(lo, hi)


# -- host-side glue ---------------------------------------------------------


def words_to_bytes(words, bits: int, n: int) -> bytes:
    """Device words -> exact reference byte stream (host)."""
    raw = np.asarray(words).astype("<u4").tobytes()
    return raw[: spec.array_bytes(bits, n)]


def bytes_to_words(data: bytes, bits: int, n: int) -> np.ndarray:
    """Reference byte stream -> device words (host)."""
    need = words_per_block(bits, n)
    buf = data[: spec.array_bytes(bits, n)]
    buf = buf + b"\0" * (need * 4 - len(buf))
    return np.frombuffer(buf, dtype="<u4").copy()
