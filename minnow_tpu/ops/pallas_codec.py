"""Fused Pallas decode kernel: packed words -> dequantized float32 in
ONE pass through HBM.

The XLA decode path (ops/bitpack.py unpack + ops/codec.py dequantize)
round-trips its layout changes through HBM: the measured attribution on
v5e (tools/decode_experiments.py) shows the (t, bits) -> (bits, t)
transpose alone running at ~1/3 of the streaming ceiling, and the full
decode at ~1/7.  This kernel keeps the whole tile pipeline VMEM-resident:

  HBM read (R, bits) words -> in-VMEM transpose -> static-slice word
  expansion -> per-row vector shifts (the Mosaic-safe formulation, see
  ops/bitpack._shift_parts) -> +min -> periodic bound -> dequantize
  (f32) -> in-VMEM transpose -> HBM write (R, 32) floats

so HBM traffic is exactly words-in + floats-out (ref decode loop:
go/bit/bit.go:41-81 + go/group.go:299-310).

Bit-exactness contract: identical to codec.decode_float_blocks32 /
the host spec in the shared deterministic dither modes (``none`` /
``midpoint``); ops/validate.py gates it on the real backend before
bench.py trusts it.  The ``uniform`` device dither stream is defined by
the XLA threefry path, so uniform decode stays on the XLA path.

Shapes: widths <= 32, pixels < 2^24, n % 32 == 0 (flagship and all
realistic minh configs); other shapes use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_float_pallas", "unpack_pallas", "supported"]


def supported(bits: int, n: int, pixels_max: int) -> bool:
    """Shapes the fused kernel handles (else use the XLA path)."""
    return (0 < bits <= 32 and n % 32 == 0 and (n // 32) % 8 == 0
            and pixels_max < (1 << 24))


def _row_shifts(bits: int):
    """Static per-element-row word indices and shift amounts: element j
    of a 32-element tile starts at bit j*bits = word w1[j], bit s[j]
    (ref go/bit/bit.go layout)."""
    offs = np.arange(32, dtype=np.int64) * bits
    s = (offs % 32).astype(np.int32)
    w1 = np.minimum(offs // 32, bits - 1).astype(np.int64)
    w2 = np.minimum(offs // 32 + 1, bits - 1).astype(np.int64)
    s2 = ((32 - s) % 32).astype(np.int32)
    return s, w1, w2, s2


def _expand_rows(wt, idx):
    """(bits, R) -> (32, R) by static row slices (the gather is a
    compile-time concat; Mosaic-safe, no dynamic indexing)."""
    rows = []
    j = 0
    while j < 32:
        k = j
        while k < 32 and idx[k] == idx[j]:
            k += 1
        row = wt[int(idx[j]):int(idx[j]) + 1, :]
        if k - j > 1:
            row = jnp.broadcast_to(row, (k - j, row.shape[1]))
        rows.append(row)
        j = k
    return jnp.concatenate(rows, axis=0)


def _unpack_tile(w, bits: int):
    """(R, bits) or padded (R, 32) words -> (32, R) u32 element values.

    The padded form exists because Mosaic's in-VMEM transpose is fast
    only for sublane-aligned minor dims: (R, 32) transposes cheaply,
    (R, 18) does not; garbage pad rows are never referenced by the
    expansion (w1/w2 < bits)."""
    s, w1, w2, s2 = _row_shifts(bits)
    mask = np.uint32((1 << bits) - 1) if bits < 32 \
        else np.uint32(0xFFFFFFFF)
    wt = w.T  # (bits|32, R) -- in-VMEM transpose
    a = _expand_rows(wt, w1)
    b = _expand_rows(wt, w2)
    # shift vectors built in-kernel (kernels cannot capture array
    # constants); & 31 instead of % 32 -- jnp.mod recurses during Mosaic
    # kernel tracing (see ops/pallas_pack.py findings)
    j = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    s_c = ((j * bits) & 31).astype(jnp.uint32)
    s2_c = ((32 - ((j * bits) & 31)) & 31).astype(jnp.uint32)
    out = a >> s_c
    out = out | jnp.where(s_c > jnp.uint32(0), b << s2_c, jnp.uint32(0))
    return out & mask


def _unpack_tile_lane(w, bits: int):
    """(R, bits) words -> (R, 32) u32 values with NO transposes: per
    output element j, static lane-column extracts + python-constant
    shifts.  Compute runs at 32/128 lane occupancy, but the op count per
    element is tiny; trades occupancy for transpose-free data flow."""
    s, w1, w2, s2 = _row_shifts(bits)
    mask = np.uint32((1 << bits) - 1) if bits < 32 \
        else np.uint32(0xFFFFFFFF)
    cols = []
    for j in range(32):
        a = w[:, int(w1[j]):int(w1[j]) + 1]
        out = a >> np.uint32(s[j])
        if s[j] > 0:
            bcol = w[:, int(w2[j]):int(w2[j]) + 1]
            out = out | (bcol << np.uint32(s2[j]))
        cols.append(out & mask)
    return jnp.concatenate(cols, axis=1)


def _decode_body(q, i, dither, mn_ref, low_ref, dx_ref, pix_ref,
                 per_ref):
    """Shared decode tail on int32 q (any layout)."""
    q = q + mn_ref[i]
    p = pix_ref[i]
    per = per_ref[i] != jnp.int32(0)
    # literals explicitly typed: weak-typed ints inside Mosaic kernels
    # recurse during lowering (round-1 jnp.mod finding, same class)
    zero = jnp.int32(0)
    qb = q + jnp.where(q < zero, p, zero)
    qb = qb - jnp.where(qb >= p, p, zero)
    q = jnp.where(per, qb, q)
    v = q.astype(jnp.float32)
    if dither == "midpoint":
        v = v + jnp.float32(0.5)
    prod = dx_ref[i] * v
    # block FMA contraction of dx*v + low (would break bit parity with
    # the spec): select on a runtime-unprovable predicate, as in
    # codec.dequantize24
    prod = jnp.where(q >= jnp.min(q), prod, jnp.float32(0))
    return prod + low_ref[i]


def _decode_kernel(bits: int, dither: str, w_ref, mn_ref, low_ref,
                   dx_ref, pix_ref, per_ref, out_ref):
    # per-block scalars live whole in SMEM, indexed by the block id
    i = pl.program_id(0)
    q = _unpack_tile(w_ref[...], bits).astype(jnp.int32)  # (32, R)
    out = _decode_body(q, i, dither, mn_ref, low_ref, dx_ref, pix_ref,
                       per_ref)
    out_ref[...] = out.T  # (R, 32)


def _decode_kernel_pad32(bits: int, dither: str, w_ref, mn_ref,
                         low_ref, dx_ref, pix_ref, per_ref, out_ref):
    i = pl.program_id(0)
    q = _unpack_tile(w_ref[...], bits).astype(jnp.int32)  # (32, R)
    out = _decode_body(q, i, dither, mn_ref, low_ref, dx_ref, pix_ref,
                       per_ref)
    out_ref[...] = out.T


def _decode_kernel_lane(bits: int, dither: str, w_ref, mn_ref, low_ref,
                        dx_ref, pix_ref, per_ref, out_ref):
    i = pl.program_id(0)
    q = _unpack_tile_lane(w_ref[...], bits).astype(jnp.int32)  # (R, 32)
    out_ref[...] = _decode_body(q, i, dither, mn_ref, low_ref, dx_ref,
                                pix_ref, per_ref)


def _unpack_kernel(bits: int, w_ref, out_ref):
    out_ref[...] = _unpack_tile(w_ref[...], bits).T  # (R, 32)


def _unpack_kernel_lane(bits: int, w_ref, out_ref):
    out_ref[...] = _unpack_tile_lane(w_ref[...], bits)


def _grid_call(kernel, b, t, r, bits, n_scalars, out_dtype,
               interpret):
    steps = t // r
    # per-block scalars are whole (B,) SMEM arrays indexed in-kernel by
    # program_id (blocked (1,1) SMEM specs fail the Mosaic divisibility
    # check); the index map must be explicit and int32 -- the default
    # map's literal zeros trace as i64 under x64, which Mosaic rejects
    scalar_spec = pl.BlockSpec((b,), lambda i, j: (np.int32(0),),
                               memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        # both grid dims are embarrassingly parallel; lets Mosaic
        # pipeline/parallelize instances instead of strict sequencing
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        grid=(b, steps),
        in_specs=[pl.BlockSpec((r, bits),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0)))]
        + [scalar_spec] * n_scalars,
        out_specs=pl.BlockSpec((r, 32),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((b * t, 32), out_dtype),
        interpret=interpret,
        **kwargs,
    )


def _pick_r(t: int) -> int:
    """Rows (tiles) per grid step: VMEM-friendly, divides t, multiple
    of 8."""
    r = min(t, 2048)
    while t % r:
        r //= 2
    return max(r, 8)


@functools.partial(jax.jit, static_argnames=("bits", "n", "dither",
                                             "interpret", "layout",
                                             "rows"))
def decode_float_pallas(words, mins, low, high, pixels, periodic,
                        bits: int, n: int, dither: str = "none",
                        interpret: bool = False,
                        layout: str = "sublane", rows: int = 0):
    """Fused decode of (B, W) packed words -> (B, n) float32.

    ``mins``/``low``/``high``/``pixels`` are (B,) per-block arrays;
    pixels must be < 2^24 (caller-checked via :func:`supported`).
    Bit-identical to codec.decode_float_blocks32 in ``none``/``midpoint``
    dither modes."""
    if dither not in ("none", "midpoint"):
        raise ValueError("pallas decode supports none/midpoint dither")
    b = words.shape[0]
    t = n // 32
    r = _pick_r(t)
    # per-block f32 dx exactly as the spec computes it: XLA f32 division
    # is approximate, so the (B,)-scalar dx goes through the pinned f64
    # path (ref go/group.go:316; codec._dx64)
    from . import codec as _codec

    low32 = low.astype(jnp.float32)
    dx = _codec._dx64(low32, high.astype(jnp.float32),
                      pixels).astype(jnp.float32)

    if rows:
        r = rows
    if layout == "pad32":
        # pad words to 32/tile so the in-VMEM transposes are
        # sublane-aligned (one streaming-speed XLA pad pass)
        wp = jnp.pad(words[:, :t * bits].reshape(b, t, bits),
                     ((0, 0), (0, 0), (0, 32 - bits)))
        w2d = wp.reshape(b * t, 32)
        call = _grid_call(
            functools.partial(_decode_kernel_pad32, bits, dither),
            b, t, r, 32, 5, jnp.float32, interpret)
        out = call(w2d,
                   mins.astype(jnp.int32),
                   low32,
                   dx,
                   pixels.astype(jnp.int32),
                   periodic.astype(jnp.int32))
        return out.reshape(b, t * 32)[:, :n]
    w2d = words[:, :t * bits].reshape(b * t, bits)
    kern = _decode_kernel if layout == "sublane" else _decode_kernel_lane
    call = _grid_call(
        functools.partial(kern, bits, dither),
        b, t, r, bits, 5, jnp.float32, interpret)
    out = call(w2d,
               mins.astype(jnp.int32),
               low32,
               dx,
               pixels.astype(jnp.int32),
               periodic.astype(jnp.int32))
    return out.reshape(b, t * 32)[:, :n]


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "layout", "rows"))
def unpack_pallas(words, bits: int, n: int, interpret: bool = False,
                  layout: str = "sublane", rows: int = 0):
    """(B, W) packed words -> (B, n) uint32 raw values (the Pallas twin
    of bitpack.unpack_batch32, for byte-level validation)."""
    b = words.shape[0]
    t = n // 32
    r = _pick_r(t)
    if rows:
        r = rows
    w2d = words[:, :t * bits].reshape(b * t, bits)
    kern = _unpack_kernel if layout == "sublane" else _unpack_kernel_lane
    call = _grid_call(functools.partial(kern, bits),
                      b, t, r, bits, 0, jnp.uint32, interpret)
    return call(w2d).reshape(b, t * 32)[:, :n]
