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
bench.py trusts it.  ``uniform`` (the counter-hash stream v2,
codec.dither_hash_u) runs fully fused in the group kernel, identical
to the XLA path bitwise.

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

__all__ = ["decode_float_pallas", "unpack_pallas", "supported",
           "decode_float_pallas_group", "unpack_pallas_group",
           "unpack_pallas_group64", "supported_group64",
           "group_tiles", "supported_group"]


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


def _unpack_tile_t_ext(wt, bits: int, word_off: int, width: int):
    """(bits, R) word-planar rows -> (32, R) u32: for each element j,
    the ``width`` bits starting at bit j*bits + 32*word_off of the
    stream.  word_off=0/width=min(bits,32) is the plain unpack;
    word_off=1/width=bits-32 extracts the high halves of 33-64-bit
    values (the shift amounts are word_off-independent; word indices
    clamp to the tile's last word, safe because the true span always
    fits and the clamped term is masked off)."""
    offs = np.arange(32, dtype=np.int64) * bits
    w1 = np.minimum(offs // 32 + word_off, bits - 1)
    w2 = np.minimum(offs // 32 + word_off + 1, bits - 1)
    mask = np.uint32((1 << width) - 1) if width < 32 \
        else np.uint32(0xFFFFFFFF)
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


def _unpack_tile_t(wt, bits: int):
    """(bits, R) word-planar rows -> (32, R) u32 element values."""
    return _unpack_tile_t_ext(wt, bits, 0, min(bits, 32))


def _unpack_tile(w, bits: int):
    """(R, bits) or padded (R, 32) words -> (32, R) u32 element values.

    The padded form exists because Mosaic's in-VMEM transpose is fast
    only for sublane-aligned minor dims: (R, 32) transposes cheaply,
    (R, 18) does not; garbage pad rows are never referenced by the
    expansion (w1/w2 < bits)."""
    return _unpack_tile_t(w.T, bits)  # in-VMEM transpose


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


def _dequant_tail(q, mn, low, dx, p, per, dither, u=None):
    """Shared decode tail on int32 q.  ``mn``/``low``/``dx``/``p``/
    ``per`` are either scalars (per-block kernels) or (1, r) per-column
    rows (multi-block instances) -- both broadcast over q.  ``u`` is
    the per-element uniform dither (same shape as q) when
    ``dither == "uniform"``; the v = f32(q) + u order matches
    codec.dequantize24 exactly."""
    q = q + mn
    # literals explicitly typed: weak-typed ints inside Mosaic kernels
    # recurse during lowering (round-1 jnp.mod finding, same class)
    zero = jnp.int32(0)
    qb = q + jnp.where(q < zero, p, zero)
    qb = qb - jnp.where(qb >= p, p, zero)
    q = jnp.where(per != zero, qb, q)
    v = q.astype(jnp.float32)
    if dither == "midpoint":
        v = v + jnp.float32(0.5)
    elif dither == "uniform":
        v = v + u
    prod = dx * v
    # block FMA contraction of dx*v + low (would break bit parity with
    # the spec): select on a runtime-unprovable predicate, as in
    # codec.dequantize24
    prod = jnp.where(q >= jnp.min(q), prod, jnp.float32(0))
    return prod + low


def _decode_body(q, i, dither, mn_ref, low_ref, dx_ref, pix_ref,
                 per_ref):
    """Per-block scalar wrapper of :func:`_dequant_tail`."""
    return _dequant_tail(q, mn_ref[i], low_ref[i], dx_ref[i],
                         pix_ref[i], per_ref[i], dither)


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


# ---------------------------------------------------------------------------
# group-aligned variant: every HBM ref has a 128-multiple minor dim
# ---------------------------------------------------------------------------
#
# The per-tile kernels above move (r, bits) / (r, 32) blocks whose minor
# dims occupy bits/128 and 32/128 of each tiled-HBM lane row -- measured
# 12-22 GB/s on v5e, DMA-bound at 7x/4x padded traffic.  Grouping
# G tiles (G*bits % 128 == 0, G*32 % 128 == 0) makes both refs dense:
#
#   words (M, G*bits) --transpose--> (G*bits, r) word-planar
#     --per-tile static row expansion + vector shifts--> (G*32, r)
#     --transpose--> (r, G*32) elements, dense write
#
# One HBM read of the words + one write of the output; both in-kernel
# transposes are Mosaic-supported at this scale (tools/mosaic_probes.py
# big_transpose).  The caller supplies words ALREADY shaped (M, G*bits)
# -- a free host-side reshape of the byte stream -- because a device
# reshape from (B, W) would relayout through HBM, re-adding a pass.


def group_tiles(bits: int) -> int:
    """Tiles per aligned group: smallest G with G*bits % 128 == 0."""
    return 64 if (64 * bits) % 128 == 0 else 128


def supported_group(bits: int, n: int, pixels_max: int = 0) -> bool:
    """Shapes the group-aligned kernel handles (else per-tile/XLA)."""
    # t/G % 8 == 0: Pallas block sublane dims must be 8-multiples
    return (0 < bits <= 32 and n % (32 * group_tiles(bits) * 8) == 0
            and pixels_max < (1 << 24))


def _tile_step(bits: int) -> int:
    """Tiles per dynamic loop step: smallest T with T*bits % 8 == 0.
    Mosaic requires dynamic sublane offsets it can prove are multiples
    of 8 ("cannot statically prove that index in dimension 0 is a
    multiple of 8" otherwise, measured on v5e); tiles within a step are
    peeled by static value slices instead."""
    import math

    return 8 // math.gcd(bits, 8)


def _bc(x, dt):
    return jax.lax.bitcast_convert_type(x, dt)


def _unpack_group_tiles(bits: int, G: int, w_ref, wt_scr, q_scr):
    """Shared body: (r, G*bits) words ref -> (G*32, r) u32 values in
    q_scr (as int32 bits; Mosaic transposes are int32-safe)."""
    # in-VMEM transpose to word-planar rows; u32 ops run as i32 bitcasts
    wt_scr[...] = _bc(w_ref[...], jnp.int32).T  # (G*bits, r)
    ts = _tile_step(bits)

    def step_body(j, carry):
        rows = _bc(wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :],
                   jnp.uint32)                       # (ts*bits, r)
        vals = jnp.concatenate(
            [_unpack_tile_t(rows[u * bits:(u + 1) * bits], bits)
             for u in range(ts)], axis=0)            # (ts*32, r)
        q_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :] = \
            _bc(vals, jnp.int32)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                      jnp.int32(0))


def _dither_u_tile(ge: int, r: int, rowcol, k1, k2):
    """In-kernel uniform dither for a planar (ge, r) tile whose
    elements are e = rowcol*ge + lane (lane = dim 0; ``rowcol`` is the
    block-local word-row index per column -- a scalar-plus-iota for the
    per-block kernel, a (1, r) masked-select row for multi-block
    instances): the same codec.dither_hash_u stream as the XLA path,
    computed fused.  ge is a power of two, so the counter build is
    shift+add only.  ``k1``/``k2`` are int32 (scalar or broadcastable
    to (1, r)); the uint32 reinterpretation happens HERE, after a
    broadcast to vector shape -- Mosaic rejects scalar tpu.bitcast
    ("operand #0 must be vector", observed on v5e)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (ge, r), 0)
    sh = np.uint32(int(np.log2(ge)))
    c = (_bc(jnp.broadcast_to(rowcol, (ge, r)), jnp.uint32) << sh) \
        + _bc(lane, jnp.uint32)
    k1v = _bc(jnp.broadcast_to(k1, (1, r)), jnp.uint32)
    k2v = _bc(jnp.broadcast_to(k2, (1, r)), jnp.uint32)
    from . import codec as _codec

    return _codec.dither_hash_u(c, k1v, k2v)


def _decode_kernel_group(bits: int, G: int, dither: str, w_ref, mn_ref,
                         low_ref, dx_ref, pix_ref, per_ref, *rest):
    if dither == "uniform":
        k1_ref, k2_ref, out_ref, wt_scr, q_scr = rest
    else:
        out_ref, wt_scr, q_scr = rest
    i = pl.program_id(0)
    _unpack_group_tiles(bits, G, w_ref, wt_scr, q_scr)
    q = q_scr[...]                                   # (G*32, r) int32
    u = None
    if dither == "uniform":
        ge, r = q.shape
        rowcol = pl.program_id(1) * jnp.int32(r) \
            + jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
        u = _dither_u_tile(ge, r, rowcol, k1_ref[i], k2_ref[i])
    out = _dequant_tail(q, mn_ref[i], low_ref[i], dx_ref[i],
                        pix_ref[i], per_ref[i], dither, u=u)
    out_ref[...] = out.T                             # (r, G*32) f32


def _decode_kernel_group_multi(bits: int, G: int, kpb: int, t_g: int,
                               dither: str, w_ref, mn_ref, low_ref,
                               dx_ref, pix_ref, per_ref, *rest):
    """Multi-block instance: one grid step decodes ``kpb`` consecutive
    blocks (r = kpb*t_g word-rows).  Small t_g otherwise makes the grid
    b instances of tiny tiles, and the measured per-instance overhead
    (DMA setup/semaphores) dominates: the same kernel ran 92-364 GB/s at
    (4096, t_g=64) run-to-run vs a stable ~330 at (512, t_g=1024).
    Per-block scalars become per-COLUMN vectors built from SMEM by
    ``kpb`` masked selects (columns of the planar q are word-rows)."""
    if dither == "uniform":
        k1_ref, k2_ref, out_ref, wt_scr, q_scr = rest
    else:
        out_ref, wt_scr, q_scr = rest
    i = pl.program_id(0)
    _unpack_group_tiles(bits, G, w_ref, wt_scr, q_scr)
    q = q_scr[...]                                   # (G*32, r) int32
    r = kpb * t_g
    col = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    base = i * jnp.int32(kpb)

    def vec(ref, fill):
        row = jnp.full((1, r), fill, ref.dtype)
        for u in range(kpb):
            sel = (col // jnp.int32(t_g)) == jnp.int32(u)
            row = jnp.where(sel, ref[base + jnp.int32(u)], row)
        return row

    uarr = None
    if dither == "uniform":
        # per-column block-local word-row: col - u*t_g via the same
        # masked selects (no in-kernel mod/div on the data path)
        sub = jnp.full((1, r), jnp.int32(0), jnp.int32)
        for u in range(kpb):
            sel = (col // jnp.int32(t_g)) == jnp.int32(u)
            sub = jnp.where(sel, jnp.int32(u * t_g), sub)
        uarr = _dither_u_tile(
            G * 32, r, col - sub,
            vec(k1_ref, jnp.int32(0)), vec(k2_ref, jnp.int32(0)))

    out = _dequant_tail(q, vec(mn_ref, jnp.int32(0)),
                        vec(low_ref, jnp.float32(0)),
                        vec(dx_ref, jnp.float32(0)),
                        vec(pix_ref, jnp.int32(1)),
                        vec(per_ref, jnp.int32(0)), dither, u=uarr)
    out_ref[...] = out.T                             # (r, G*32) f32


def _unpack_kernel_group(bits: int, G: int, w_ref, out_ref, wt_scr,
                         q_scr):
    _unpack_group_tiles(bits, G, w_ref, wt_scr, q_scr)
    out_ref[...] = _bc(q_scr[...].T, jnp.uint32)     # (r, G*32)


def _group_call(kernel, b, t_g, r, gw, ge, n_scalars, out_dtype,
                interpret, scalar_len=None):
    """Grid (b, t_g//r) over (r, gw) -> (r, ge) blocks with whole SMEM
    scalar arrays.  The multi-block-per-instance decode path reuses
    this with b = blocks/kpb instances of t_g = kpb*t_g rows and
    ``scalar_len`` = the true block count."""
    steps = t_g // r
    scalar_spec = pl.BlockSpec((scalar_len or b,),
                               lambda i, j: (np.int32(0),),
                               memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        grid=(b, steps),
        in_specs=[pl.BlockSpec((r, gw),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0)))]
        + [scalar_spec] * n_scalars,
        out_specs=pl.BlockSpec((r, ge),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((b * t_g, ge), out_dtype),
        scratch_shapes=[pltpu.VMEM((gw, r), jnp.int32),
                        pltpu.VMEM((ge, r), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )


def _pick_r_group(t_g: int, rows: int = 0, G: int = 128,
                  bits: int = 32) -> int:
    """Largest 8-multiple <= min(rows or default, t_g) dividing t_g
    (Mosaic sublane blocks/offsets must be 8-multiples; t_g itself is
    an 8-multiple per supported_group, so 8 always terminates).

    Default chunk rows: 128, except 256 for big blocks (t_g >= 1024)
    at narrow G=64 widths: the round-5 on-chip sweep at (64->512,
    2^21, bits=18) read 391 GB/s paired-median at r=256 vs 333 at
    r=128 (83/164 at 32/64).  The Mosaic-compile envelope was
    certified per width on chip (2026-08-20, t_g=1024): r=256
    compiles through G*bits = 1280 (bits <= 20 at G=64) and fails
    from 1408 (bits >= 22) -- wider words keep 128."""
    default = 256 if (t_g >= 1024 and G * bits <= 1280) else 128
    r = max(min(rows or default, t_g) // 8 * 8, 8)
    while t_g % r:
        r -= 8
    return r


@functools.partial(jax.jit, static_argnames=("bits", "n", "dither",
                                             "interpret", "rows"))
def decode_float_pallas_group(words2d, mins, low, high, pixels,
                              periodic, bits: int, n: int,
                              dither: str = "none",
                              interpret: bool = False, rows: int = 0,
                              key1=None, key2=None):
    """Fused aligned decode: (B*t/G, G*bits) words -> (B*t/G, G*32)
    float32 (row-major identical to (B, n); reshape on host is free).

    ``words2d`` must already be the aligned 2-D view -- see the module
    comment.  Scalars are (B,) per-block arrays; semantics identical to
    :func:`decode_float_pallas`.  ``dither="uniform"`` (the DEFAULT
    production read mode, ref go/group.go:299-310) runs the counter-
    hash dither (codec.dither_hash_u) fused in-kernel, bit-identical to
    the XLA path; pass the per-block ``dither_keys`` as (key1, key2)."""
    if dither not in ("none", "midpoint", "uniform"):
        raise ValueError("pallas decode supports none/midpoint/uniform"
                         " dither")
    if dither == "uniform" and (key1 is None or key2 is None):
        raise ValueError("uniform dither needs per-block keys "
                         "(codec.dither_keys)")
    b = mins.shape[0]
    G = group_tiles(bits)
    t_g = (n // 32) // G
    ge = G * 32
    gw = G * bits
    if words2d.shape != (b * t_g, gw):
        raise ValueError("words2d must be (B*t/G, G*bits), got %s"
                         % (words2d.shape,))
    from . import codec as _codec

    low32 = low.astype(jnp.float32)
    dx = _codec._dx64(low32, high.astype(jnp.float32),
                      pixels).astype(jnp.float32)
    args = (words2d, mins.astype(jnp.int32), low32, dx,
            pixels.astype(jnp.int32), periodic.astype(jnp.int32))
    n_scalars = 5
    if dither == "uniform":
        args = args + (_bc(key1.astype(jnp.uint32), jnp.int32),
                       _bc(key2.astype(jnp.uint32), jnp.int32))
        n_scalars = 7

    # small blocks: merge kpb consecutive blocks per grid instance so
    # per-instance overhead amortizes (see _decode_kernel_group_multi)
    kpb = 1
    if not rows and t_g < 128:
        for cand in range(min(128 // t_g, b), 0, -1):
            if b % cand == 0:
                kpb = cand
                break
    if kpb > 1:
        call = _group_call(
            functools.partial(_decode_kernel_group_multi, bits, G, kpb,
                              t_g, dither),
            b // kpb, kpb * t_g, kpb * t_g, gw, ge, n_scalars,
            jnp.float32, interpret, scalar_len=b)
        return call(*args)

    r = _pick_r_group(t_g, rows, G, bits)
    call = _group_call(
        functools.partial(_decode_kernel_group, bits, G, dither),
        b, t_g, r, gw, ge, n_scalars, jnp.float32, interpret)
    return call(*args)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows"))
def unpack_pallas_group(words2d, bits: int, n: int,
                        interpret: bool = False, rows: int = 0):
    """(B*t/G, G*bits) aligned words -> (B*t/G, G*32) uint32 raw
    values (the aligned twin of unpack_pallas; B inferred from rows)."""
    G = group_tiles(bits)
    t_g = (n // 32) // G
    gw = G * bits
    m = words2d.shape[0]
    b = m // t_g
    if words2d.shape != (b * t_g, gw) or b * t_g != m:
        raise ValueError("words2d must be (B*t/G, G*bits), got %s"
                         % (words2d.shape,))
    r = _pick_r_group(t_g, rows, G, bits)
    call = _group_call(functools.partial(_unpack_kernel_group, bits, G),
                       b, t_g, r, gw, G * 32, 0, jnp.uint32, interpret)
    return call(words2d)


def _unpack_kernel_group64(bits: int, G: int, w_ref, out_ref, wt_scr,
                           q_scr):
    """(r, G*bits) words of 33-64-bit values -> (r, 2*G*32) u32: low
    halves in columns [0, G*32), high halves in [G*32, 2*G*32)."""
    wt_scr[...] = _bc(w_ref[...], jnp.int32).T       # (G*bits, r)
    ts = _tile_step(bits)
    ge = G * 32

    def step_body(j, carry):
        rows = _bc(wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :],
                   jnp.uint32)                       # (ts*bits, r)
        lo = jnp.concatenate(
            [_unpack_tile_t_ext(rows[u * bits:(u + 1) * bits], bits,
                                0, 32) for u in range(ts)], axis=0)
        hi = jnp.concatenate(
            [_unpack_tile_t_ext(rows[u * bits:(u + 1) * bits], bits,
                                1, bits - 32) for u in range(ts)],
            axis=0)
        q_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :] = \
            _bc(lo, jnp.int32)
        q_scr[pl.ds(np.int32(ge) + j * np.int32(ts * 32), ts * 32),
              :] = _bc(hi, jnp.int32)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                      jnp.int32(0))
    out_ref[...] = _bc(q_scr[...].T, jnp.uint32)     # (r, 2*G*32)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows"))
def unpack_pallas_group64(words2d, bits: int, n: int,
                          interpret: bool = False, rows: int = 0):
    """(B*t/G, G*bits) aligned words of 33-64-bit values ->
    ((B*t/G, G*32) lo, (B*t/G, G*32) hi) uint32 halves (the wide twin
    of unpack_pallas_group; the caller combines lo | hi << 32 -- int64
    vector arithmetic is not available in Mosaic)."""
    if not 32 < bits <= 64:
        raise ValueError("unpack_pallas_group64 requires 32 < bits <= 64")
    G = group_tiles(bits)
    t_g = (n // 32) // G
    gw = G * bits
    ge = G * 32
    m = words2d.shape[0]
    b = m // t_g
    if words2d.shape != (b * t_g, gw) or b * t_g != m:
        raise ValueError("words2d must be (B*t/G, G*bits), got %s"
                         % (words2d.shape,))
    r = _pick_r_group(t_g, rows, G, bits)
    steps = t_g // r
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    out = pl.pallas_call(
        functools.partial(_unpack_kernel_group64, bits, G),
        grid=(b, steps),
        in_specs=[pl.BlockSpec((r, gw),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0)))],
        out_specs=pl.BlockSpec((r, 2 * ge),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((b * t_g, 2 * ge), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((gw, r), jnp.int32),
                        pltpu.VMEM((2 * ge, r), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(words2d)
    return out[:, :ge], out[:, ge:]


def supported_group64(bits: int, n: int) -> bool:
    """Shapes the wide (33-64-bit) group unpack handles."""
    return 32 < bits <= 64 and n % (32 * group_tiles(bits) * 8) == 0


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
