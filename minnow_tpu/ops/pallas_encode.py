"""Fused Pallas encode kernel: float32 block -> packed words in ONE
pass through HBM.

The XLA encode path runs two HBM passes (prepare: x in / deltas out,
then pack: deltas in / words out), ~14.25 bytes of traffic per element.
This kernel holds one whole minnow block in VMEM and runs

  quantize (exact, integer) -> periodic recenter -> min/max stats ->
  delta -> bit-pack at the column's static predicted width

reading x (4 B/elem) and writing words (bits/8 B/elem) only
(ref fused hot loop: go/group.go:312-327 + go/bit/bit.go:100-131).

Exact quantization without 64-bit integers: quantize_fast
(ops/fastdiv.py) is re-derived in 16-bit-limb uint32 arithmetic --
every 64-bit product of the magic-reciprocal expression is decomposed
into 16x16 partial products with explicit carries, so the kernel needs
only native u32/i32 VPU ops (Mosaic has no unsigned reductions and may
lack i64 vectors; round-1 findings in ops/pallas_pack.py).  Bit-for-bit
equal to fastdiv.quantize_fast (tests/test_pallas_codec.py).

Width handling: the pack width is static per call -- the column's
predicted width ``bits_needed(pixels - 1)``.  The kernel also emits the
true per-block (min, maxdelta, valid); the host wrapper re-encodes the
rare blocks whose true width differs (clustered data where
min-subtraction wins) or that the quantizer cannot certify, via the
normative XLA/host path.  Bytes are therefore always reference-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encode_float_pallas", "supported"]


def supported(bits: int, n: int, pixels_max: int) -> bool:
    # n cap: the kernel holds one whole block (x in, q scratch, words
    # out) in VMEM -- t = n/32 <= 8192 keeps that under ~4 MB with
    # double-buffered pipelining; bigger blocks use the XLA path
    return (0 < bits <= 30 and n % 32 == 0 and (n // 32) % 8 == 0
            and n <= (8192 * 32) and pixels_max < (1 << 24))


# ---------------------------------------------------------------------------
# 16-bit-limb u32 arithmetic (all intermediates provably < 2^32)
# ---------------------------------------------------------------------------


def _umulhi_24x32(a, m):
    """high32(a * m) for a < 2^24, m < 2^32, in u32 ops."""
    a0 = a & np.uint32(0xFFFF)
    a1 = a >> np.uint32(16)          # < 2^8
    u0 = m & np.uint32(0xFFFF)
    u1 = m >> np.uint32(16)
    ll = a0 * u0                      # < 2^32
    lh = a0 * u1                      # < 2^32
    hl = a1 * u0                      # < 2^24
    hh = a1 * u1                      # < 2^24
    carry = ((ll >> np.uint32(16)) + (lh & np.uint32(0xFFFF))
             + (hl & np.uint32(0xFFFF))) >> np.uint32(16)
    return hh + (lh >> np.uint32(16)) + (hl >> np.uint32(16)) + carry


def _umul_full(a, m, a_max_bits: int, m_max_bits: int):
    """(lo32, hi32) of a * m for a < 2^a_max_bits (<=25),
    m < 2^m_max_bits (<=24); product < 2^49."""
    a0 = a & np.uint32(0xFFFF)
    a1 = a >> np.uint32(16)
    u0 = m & np.uint32(0xFFFF)
    u1 = m >> np.uint32(16)
    y0 = a0 * u0
    mid = a0 * u1 + a1 * u0          # < 2^26 for the given bounds
    y3 = a1 * u1
    lo = y0 + (mid << np.uint32(16))  # wrapping
    carry = ((y0 >> np.uint32(16)) + (mid & np.uint32(0xFFFF))) \
        >> np.uint32(16)
    hi = y3 + (mid >> np.uint32(16)) + carry
    return lo, hi


def _quantize_limb(diff, b, eb, m0, m1, slim: bool = False):
    """floor(RN32(diff / dx)) as int32, pure u32/i32 ops.

    Per-element f32 ``diff``; scalars ``b`` (24-bit divisor mantissa),
    ``eb`` (i32 exponent), ``m0``/``m1`` (magic reciprocal limbs,
    m1 < 2^17).  Returns (q i32, exact bool).  Same certification
    semantics as fastdiv.quantize_fast(out32=True).

    ``slim=True`` is the production fused-kernel variant: it FLAGS
    (exact=False) the rare inputs the full path handles in-line --
    subnormal diffs, negative diffs, quotients >= 2^24 -- instead of
    computing them, saving ~20% of the quantizer's vector ops
    (tools/encode_attrib.py: the quantizer is 51% of kernel time).
    Soundness is unchanged: a flagged element invalidates its block and
    the caller re-encodes via the normative XLA/host path, so certified
    bytes are reference-exact either way.  A kernel may use slim only
    if whatever certifies its blocks flags at least slim's flag set:
    the fused kernels consume their own exact flags; the stateless
    big-block pack kernel is certified by the XLA stats pass, which
    therefore runs fastdiv.quantize_fast(slim_gate=True)."""
    bits_ = jax.lax.bitcast_convert_type(diff, jnp.uint32)
    sign = bits_ >> np.uint32(31)
    e_raw = ((bits_ >> np.uint32(23))
             & np.uint32(0xFF)).astype(jnp.int32)
    m_raw = bits_ & np.uint32(0x7FFFFF)
    is_zero = (bits_ & np.uint32(0x7FFFFFFF)) == 0
    invalid = e_raw == jnp.int32(255)

    if slim:
        # flag instead of handling: subnormal or negative diffs (incl.
        # -0.0, which on flush-to-zero backends may stand for a true
        # negative-subnormal difference -- see fastdiv.quantize_fast)
        invalid = invalid | (e_raw == jnp.int32(0)) \
            | (sign != np.uint32(0))
        a = m_raw | np.uint32(1 << 23)
        ea = e_raw - jnp.int32(150)
    else:
        # subnormal renormalization: exact msb via f32 conversion.
        # max in int32 -- Mosaic has no arith.maxui; m_raw < 2^23 is
        # sign-safe
        safe_m = jnp.maximum(
            jax.lax.bitcast_convert_type(m_raw, jnp.int32), jnp.int32(1))
        msb = (jax.lax.bitcast_convert_type(
            safe_m.astype(jnp.float32), jnp.uint32)
            >> np.uint32(23)).astype(jnp.int32) - jnp.int32(127)
        shn = (jnp.int32(23) - msb).astype(jnp.uint32)
        subn = e_raw == jnp.int32(0)
        a = jnp.where(subn, m_raw << shn, m_raw | np.uint32(1 << 23))
        ea = jnp.where(subn, jnp.int32(-149) - shn.astype(jnp.int32),
                       e_raw - jnp.int32(150))

    t = (a < b).astype(jnp.int32)
    # q24 = ((a*m0 >> 32) + a*m1) >> (40 - s), s = 23 + t
    hi_am0 = _umulhi_24x32(a, m0)                 # < 2^24
    lo1, hi1 = _umul_full(a, m1, 24, 17)          # a*m1 < 2^41
    s_lo = hi_am0 + lo1                           # wrapping
    carry = (s_lo < hi_am0).astype(jnp.uint32)
    s_hi = hi1 + carry                            # < 2^10
    sh = (np.uint32(17) - t.astype(jnp.uint32))   # 40 - s in {16, 17}
    q24 = (s_lo >> sh) | (s_hi << (np.uint32(32) - sh))  # < 2^25

    # rem = (a << s) - q24*b; rem < b < 2^24 so the low-32 wrap is exact
    s_full = (np.uint32(23) + t.astype(jnp.uint32))
    n_lo = a << s_full                            # wrapping
    p_lo, _ = _umul_full(q24, b, 25, 24)
    rem = n_lo - p_lo                             # exact (< 2^24)

    r2 = rem << np.uint32(1)
    up = (r2 > b) | ((r2 == b) & ((q24 & np.uint32(1)) == np.uint32(1)))
    m_mant = q24 + up.astype(jnp.uint32)
    e_z = ea - eb - t
    ovf = m_mant == np.uint32(1 << 24)
    m_mant = jnp.where(ovf, np.uint32(1 << 23), m_mant)
    e_z = e_z + ovf.astype(jnp.int32)

    if slim:
        # quotients >= 2^24 flagged (pixels < 2^24, so any such element
        # is out of range / fallback-bound anyway); inputs are
        # non-negative here, so floor is a single clamped right shift.
        # e_z < -120 needs no flag: floor of a tiny POSITIVE quotient
        # is exactly 0, which the 31-clamped shift already yields.
        invalid = invalid | (e_z >= jnp.int32(24))
        dn_sh = jnp.clip(jnp.int32(23) - e_z, jnp.int32(0),
                         jnp.int32(31)).astype(jnp.uint32)
        q_val = (m_mant >> dn_sh).astype(jnp.int32)
        q_val = jnp.where(is_zero, jnp.int32(0), q_val)
        return q_val, (is_zero & (sign == np.uint32(0))) | ~invalid

    invalid = invalid | (e_z >= jnp.int32(30)) | (e_z < jnp.int32(-120))

    # floor(+-m_mant * 2^(e_z - 23)) with u32-safe shift amounts
    big = e_z >= jnp.int32(23)
    up_sh = jnp.clip(e_z - jnp.int32(23), jnp.int32(0),
                     jnp.int32(30)).astype(jnp.uint32)
    dn_raw = jnp.clip(jnp.int32(23) - e_z, jnp.int32(0),
                      jnp.int32(31 + 120 + 23))
    dn_sh = jnp.minimum(dn_raw, jnp.int32(31)).astype(jnp.uint32)
    hi_zero = dn_raw >= jnp.int32(24)             # m_mant < 2^24
    q_mag = jnp.where(big, m_mant << up_sh,
                      jnp.where(hi_zero, np.uint32(0), m_mant >> dn_sh))
    frac_mask = (np.uint32(1) << dn_sh) - np.uint32(1)
    # frac as an i32 0/1 select: Mosaic cannot select_n on i1 vectors
    # ("Unsupported target bitwidth for truncation")
    frac_nz = jnp.where(
        hi_zero,
        (m_mant != np.uint32(0)).astype(jnp.int32),
        ((m_mant & frac_mask) != np.uint32(0)).astype(jnp.int32))
    frac = jnp.where(big, jnp.int32(0), frac_nz)
    q_val = jnp.where(sign == np.uint32(0), q_mag.astype(jnp.int32),
                      -(q_mag.astype(jnp.int32)) - frac)
    q_val = jnp.where(is_zero, jnp.int32(0), q_val)
    # -0.0 flagged like fastdiv.quantize_fast (flush-to-zero soundness)
    negzero = is_zero & (sign != np.uint32(0))
    return q_val, (is_zero & (sign == np.uint32(0))) \
        | (~(invalid | negzero))


# ---------------------------------------------------------------------------
# in-kernel codec stages (ref go/group.go)
# ---------------------------------------------------------------------------


def _periodic_distance(x, x0, p):
    d = x - x0
    return jnp.where(
        d >= jnp.int32(0),
        jnp.where(d > p - d, d - p, d),
        jnp.where(d < -(d + p), p + d, d))


def _pack_tile_planar(deltas_t, bits: int):
    """(32, t) u32 deltas -> (bits, t) word-planar stream words (the
    Mosaic-safe vector-shift + static-slice-sum formulation of
    ops/bitpack)."""
    t_len = deltas_t.shape[1]
    mask = np.uint32((1 << bits) - 1) if bits < 32 \
        else np.uint32(0xFFFFFFFF)
    j = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    s = ((j * bits) & 31).astype(jnp.uint32)
    s2 = ((np.int32(32) - ((j * bits) & 31)) & 31).astype(jnp.uint32)
    w = (np.arange(32, dtype=np.int64) * bits) // 32

    xm = deltas_t & mask
    part_lo = xm << s
    part_sp = jnp.where(s > jnp.uint32(0), xm >> s2, jnp.uint32(0))

    # Mosaic lacks unsigned reductions; int32 addition is bitwise equal
    bc = jax.lax.bitcast_convert_type
    part_lo = bc(part_lo, jnp.int32)
    part_sp = bc(part_sp, jnp.int32)

    rows = []
    for word in range(bits):
        acc = None
        for part, idx in ((part_lo, w), (part_sp, w + 1)):
            j0 = int(np.searchsorted(idx, word, side="left"))
            j1 = int(np.searchsorted(idx, word, side="right"))
            if j1 > j0:
                seg = part[j0:j1].sum(axis=0, dtype=jnp.int32,
                                      keepdims=True)
                acc = seg if acc is None else acc + seg
        rows.append(acc if acc is not None
                    else jnp.zeros((1, t_len), jnp.int32))
    return bc(jnp.concatenate(rows, axis=0), jnp.uint32)  # (bits, t)


def _pack_tile(deltas_t, bits: int):
    """(32, t) u32 deltas -> (t, bits) stream words."""
    return _pack_tile_planar(deltas_t, bits).T


def _pack_tile_planar64(lo_t, hi_t, bits: int):
    """(32, t) u32 delta limb planes -> (bits, t) word-planar stream
    words for widths 33-64 (the intGroup ID-column widths,
    ref go/group.go:242-255 + go/bit/bit.go:100-131).

    Limb H (value bits [32, bits)) sits at bit offset i*bits + 32 --
    the SAME lane shift as limb L exactly one word later -- so the
    Mosaic-safe planar formulation of :func:`_pack_tile_planar` extends
    with two more (part, word-index) pairs instead of any 64-bit
    arithmetic."""
    t_len = lo_t.shape[1]
    hmask = np.uint32((1 << (bits - 32)) - 1) if bits < 64 \
        else np.uint32(0xFFFFFFFF)
    j = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    s = ((j * bits) & 31).astype(jnp.uint32)
    s2 = ((np.int32(32) - ((j * bits) & 31)) & 31).astype(jnp.uint32)
    w = (np.arange(32, dtype=np.int64) * bits) // 32

    hi = hi_t & hmask
    lo_lo = lo_t << s
    lo_sp = jnp.where(s > jnp.uint32(0), lo_t >> s2, jnp.uint32(0))
    hi_lo = hi << s
    hi_sp = jnp.where(s > jnp.uint32(0), hi >> s2, jnp.uint32(0))

    bc = jax.lax.bitcast_convert_type
    parts = ((bc(lo_lo, jnp.int32), w), (bc(lo_sp, jnp.int32), w + 1),
             (bc(hi_lo, jnp.int32), w + 1), (bc(hi_sp, jnp.int32),
                                             w + 2))
    rows = []
    for word in range(bits):
        acc = None
        for part, idx in parts:
            j0 = int(np.searchsorted(idx, word, side="left"))
            j1 = int(np.searchsorted(idx, word, side="right"))
            if j1 > j0:
                seg = part[j0:j1].sum(axis=0, dtype=jnp.int32,
                                      keepdims=True)
                acc = seg if acc is None else acc + seg
        rows.append(acc if acc is not None
                    else jnp.zeros((1, t_len), jnp.int32))
    return bc(jnp.concatenate(rows, axis=0), jnp.uint32)  # (bits, t)


def _encode_kernel(bits: int, chunk: int, x_ref, low_ref, b_ref,
                   eb_ref, m0_ref, m1_ref, pix_ref, per_ref, w_ref,
                   mn_ref, maxd_ref, valid_ref, q_scr):
    # per-block scalars live whole in SMEM, indexed by the block id
    i = pl.program_id(0)
    t = x_ref.shape[0]
    # int32 loop bounds everywhere: python-int bounds trace the
    # induction var as i64 under x64, and the resulting in-kernel i64
    # convert recurses in Mosaic lowering
    steps = jnp.int32(t // chunk)
    zero = jnp.int32(0)
    p = pix_ref[i]

    # Every stage runs in row-chunks through the VMEM scratch: the limb
    # quantizer has ~40 live temporaries and the pack another ~10, so
    # whole-(t, 32)-block stages blow the 16 MB scoped-VMEM stack for
    # t >= 4096 (measured on v5e).  VMEM re-reads of q_scr are free
    # relative to the HBM traffic this kernel exists to save.

    # pass 1: quantize -> scratch; exactness reduction (i32 min --
    # Mosaic has no bool reductions)
    def quant_body(c, ex_carry):
        xc = x_ref[pl.ds(c * np.int32(chunk), chunk), :]
        diff = xc - low_ref[i]           # f32 sub, exact per spec
        qc, exact = _quantize_limb(diff, b_ref[i], eb_ref[i],
                                   m0_ref[i], m1_ref[i], slim=True)
        q_scr[pl.ds(c * np.int32(chunk), chunk), :] = qc
        return jnp.minimum(ex_carry,
                           jnp.min(exact.astype(jnp.int32)))
    ex_min = jax.lax.fori_loop(jnp.int32(0), steps, quant_body,
                               jnp.int32(1))
    all_exact = ex_min == jnp.int32(1)

    # pass 2: periodic-distance stats vs q[0,0] + in-range check
    # (spec.periodic_min_fast's one-pass reduction, chunked), plus plain
    # min/max in the same sweep -- the recentered min/max follow
    # algebraically (see the group kernel), saving a third sweep
    x0 = q_scr[0, 0]

    def ystat_body(c, carry):
        ymin_c, ymax_c, inr_c, qmin_c, qmax_c = carry
        qc = q_scr[pl.ds(c * np.int32(chunk), chunk), :]
        y = _periodic_distance(qc, x0, p)
        inr = jnp.min(((qc >= zero) & (qc < p)).astype(jnp.int32))
        return (jnp.minimum(ymin_c, jnp.min(y)),
                jnp.maximum(ymax_c, jnp.max(y)),
                jnp.minimum(inr_c, inr),
                jnp.minimum(qmin_c, jnp.min(qc)),
                jnp.maximum(qmax_c, jnp.max(qc)))
    big = jnp.int32(0x7FFFFFFF)
    ymin, ymax, inr_min, qmin, qmax = jax.lax.fori_loop(
        jnp.int32(0), steps, ystat_body,
        (big, -big, jnp.int32(1), big, -big))
    in_range = inr_min == jnp.int32(1)

    wwin = ymax - ymin + jnp.int32(1)
    small = wwin <= p // jnp.int32(2)
    m = x0 + ymin
    m = jnp.where(m < zero, m + p, m)
    m = jnp.where(small, m, zero)
    per = per_ref[i] != zero

    def recenter(qc):
        qb = qc + jnp.where(qc < m, p, zero)
        qb = qb - jnp.where(qb >= m + p, p, zero)
        return jnp.where(per, qb, qc)

    shifted = per & small
    mn = jnp.where(shifted, m, qmin)
    mx = jnp.where(shifted, m + wwin - jnp.int32(1), qmax)

    # pass 4: delta + pack, chunk rows of the output words
    def pack_body(c, carry):
        qc = recenter(q_scr[pl.ds(c * np.int32(chunk), chunk), :])
        deltas = jax.lax.bitcast_convert_type(qc - mn, jnp.uint32)
        w_ref[pl.ds(c * np.int32(chunk), chunk), :] = \
            _pack_tile(deltas.T, bits)
        return carry
    jax.lax.fori_loop(jnp.int32(0), steps, pack_body, zero)

    mn_ref[i] = mn
    maxd_ref[i] = mx - mn
    valid_ref[i] = ((in_range | ~per) & all_exact).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret"))
def encode_float_pallas(x, low, b, eb, m0, m1, pixels, periodic,
                        bits: int, n: int, interpret: bool = False):
    """Fused encode of (B, n) float32 -> packed words at static width
    ``bits`` (= the column's predicted width).

    ``low``/``periodic``/``pixels`` and the divisor decomposition
    ``b/eb/m0/m1`` (fastdiv.divisor_magic, u32 limbs) are (B,) arrays.
    Returns ``(words (B, t*bits), mins (B,), maxd (B,), valid (B,))``;
    ``valid`` is False for blocks the in-kernel quantizer cannot certify
    or with out-of-range pixels -- the caller re-encodes those (and any
    block whose true width != bits) via the XLA/host path."""
    bsz = x.shape[0]
    t = n // 32
    steps_r = min(t, 1024)
    while t % steps_r:
        steps_r //= 2
    r = max(steps_r, 8)
    steps = t // r

    x2d = x[:, :n].reshape(bsz * t, 32)
    # per-block scalars whole in SMEM (blocked (1,1) SMEM specs fail
    # the Mosaic divisibility check); kernel indexes by program_id.
    # Explicit int32 index map: the default map's literal zeros trace
    # as i64 under x64, which Mosaic rejects.
    scalar = pl.BlockSpec((bsz,), lambda i: (np.int32(0),),
                          memory_space=pltpu.SMEM)

    chunk = min(t, 256)

    # one whole block per grid row: grid = (B,) -- splitting rows across
    # grid steps would split the min/max reductions
    out = pl.pallas_call(
        functools.partial(_encode_kernel, bits, chunk),
        grid=(bsz,),
        in_specs=[pl.BlockSpec((t, 32), lambda i: (i, np.int32(0)))]
        + [scalar] * 7,
        out_specs=[
            pl.BlockSpec((t, bits), lambda i: (i, np.int32(0))),
            scalar,
            scalar,
            scalar,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * t, bits), jnp.uint32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((t, 32), jnp.int32)],
        interpret=interpret,
    )(x2d,
      low.astype(jnp.float32),
      b.astype(jnp.uint32),
      eb.astype(jnp.int32),
      m0.astype(jnp.uint32),
      m1.astype(jnp.uint32),
      pixels.astype(jnp.int32),
      periodic.astype(jnp.int32))
    words, mins, maxd, valid = out
    return (words.reshape(bsz, t * bits), mins.astype(jnp.int64),
            maxd.astype(jnp.int64), valid != 0)


# ---------------------------------------------------------------------------
# group-aligned variant: every HBM ref has a 128-multiple minor dim
# ---------------------------------------------------------------------------
#
# The kernel above moves (t, 32) / (t, bits) blocks: 32/128 and bits/128
# of every tiled-HBM lane row, i.e. 4x read and 128/bits write DMA
# amplification, and the quantizer runs at 25% lane occupancy.  Grouping
# G = pallas_codec.group_tiles(bits) tiles per row makes x (t/G, G*32)
# and words (t/G, G*bits) both dense; only the pack needs tile-major
# data, obtained by per-chunk in-kernel transposes (Mosaic-supported at
# this scale, tools/mosaic_probes.py big_transpose).  The caller
# supplies x ALREADY shaped (B*t/G, G*32) -- a free host-side reshape --
# because a device reshape from (B, n) would relayout through HBM.


def supported_group_enc(bits: int, n: int, pixels_max: int) -> bool:
    from .pallas_codec import group_tiles

    g = group_tiles(bits)
    # t/G % 8 == 0: Pallas block sublane dims must be 8-multiples;
    # t/G <= 256 keeps the whole-block q scratch (t/G, G*32) <= 2 MB
    return (0 < bits <= 30 and n % (32 * g * 8) == 0
            and n <= (32 * g * 256) and pixels_max < (1 << 24))


def make_const_cfg(low, b, eb, m0, m1, pixels, periodic):
    """Build the static column-constant tuple ``const_cfg`` consumed by
    :func:`encode_float_pallas_group` / ``_encode_group_block``.

    The ONLY sanctioned constructor: the tuple is positional, and the
    kernel unpacks it positionally, so every call site (pipeline,
    bench, validate, tools) must come through here to stay in sync.
    Accepts scalars or length-uniform arrays (first element taken)."""
    import numpy as np

    def _s(v):
        return np.asarray(v).ravel()[0]

    return (float(_s(low)), int(_s(b)), int(_s(eb)), int(_s(m0)),
            int(_s(m1)), int(_s(pixels)), bool(_s(periodic)))


def _encode_kernel_group(bits: int, G: int, cs: int, kpb: int,
                         t_g: int, x_ref, low_ref,
                         b_ref, eb_ref, m0_ref, m1_ref, pix_ref,
                         per_ref, w_ref, mn_ref, maxd_ref, valid_ref,
                         q_scr, qt_scr, wt_scr, cfg=None):
    """Encode ``kpb`` consecutive blocks per grid instance (static
    unroll; block u occupies rows [u*t_g, (u+1)*t_g) of the refs and
    reuses the (t_g, G*32) quantize scratch).  Merging exists because
    per-instance overhead (~4-5 us DMA/semaphore setup, measured via
    the decode twin) dominates at small t_g: b=4096 single-block
    instances cost ~18 ms of pure overhead."""
    i = pl.program_id(0)
    for u in range(kpb):
        _encode_group_block(bits, G, cs, t_g, u * t_g,
                            i * jnp.int32(kpb) + jnp.int32(u),
                            x_ref, low_ref, b_ref, eb_ref, m0_ref,
                            m1_ref, pix_ref, per_ref, w_ref, mn_ref,
                            maxd_ref, valid_ref, q_scr, qt_scr, wt_scr,
                            cfg=cfg)


def _encode_group_block(bits: int, G: int, cs: int, t_g: int, ro: int,
                        i, x_ref, low_ref,
                        b_ref, eb_ref, m0_ref, m1_ref, pix_ref,
                        per_ref, w_ref, mn_ref, maxd_ref, valid_ref,
                        q_scr, qt_scr, wt_scr, cfg=None):
    """One block's fused encode: rows [ro, ro+t_g) of x_ref/w_ref,
    scalar index ``i`` (traced), scratch indexed from row 0.

    ``cfg`` (column-constant specialization, the round-3 open encode
    experiment): a static ``(low, b, eb, m0, m1, pixels, periodic)``
    tuple baking the per-column scalars into the compiled program --
    the SMEM scalar refs are then None.  Same arithmetic on constant
    operands (the only f32 op, ``x - low``, rounds identically), so
    bytes are unchanged; what it buys is Mosaic constant-folding in
    the quantizer chain plus STATIC periodic handling (the recenter
    selects and the valid/min/max periodic muxes drop out of the
    per-element path entirely for non-periodic columns)."""
    steps = jnp.int32(t_g // cs)
    zero = jnp.int32(0)
    if cfg is None:
        p = pix_ref[i]
        low_s, b_s, eb_s, m0_s, m1_s = (low_ref[i], b_ref[i], eb_ref[i],
                                        m0_ref[i], m1_ref[i])
        per_static = None
    else:
        low_c, b_c, eb_c, m0_c, m1_c, pix_c, per_c = cfg
        p = jnp.int32(pix_c)
        low_s = np.float32(low_c)
        b_s = np.uint32(b_c)
        eb_s = np.int32(eb_c)
        m0_s = np.uint32(m0_c)
        m1_s = np.uint32(m1_c)
        per_static = bool(per_c)
    bc = jax.lax.bitcast_convert_type

    # pass 1: quantize -> scratch, with the periodic-distance stats
    # computed on the SAME in-register chunk (one VMEM sweep instead of
    # two; the recentered min/max follow algebraically, so no third
    # pass either -- see below).  Elementwise on dense (cs, G*32)
    # chunks: full lane occupancy, unlike the (chunk, 32) layout above.
    def quant_chunk(c):
        xc = x_ref[pl.ds(np.int32(ro) + c * np.int32(cs), cs), :]
        diff = xc - low_s                # f32 sub, exact per spec
        qc, exact = _quantize_limb(diff, b_s, eb_s, m0_s, m1_s,
                                   slim=True)
        q_scr[pl.ds(c * np.int32(cs), cs), :] = qc
        return qc, jnp.min(exact.astype(jnp.int32))

    def chunk_stats(qc, x0):
        y = _periodic_distance(qc, x0, p)
        inr = jnp.min(((qc >= zero) & (qc < p)).astype(jnp.int32))
        return (jnp.min(y), jnp.max(y), inr, jnp.min(qc), jnp.max(qc))

    # chunk 0 peeled: the periodic reference element -- the block's
    # q[0,0] (global element 0: the (t/G, G*32) view is row-major in
    # element order) -- comes straight from its in-register values
    qc0, ex0 = quant_chunk(zero)
    x0 = qc0[0, 0]
    ymin0, ymax0, inr0, qmin0, qmax0 = chunk_stats(qc0, x0)

    def fused_body(c, carry):
        ex_c, ymin_c, ymax_c, inr_c, qmin_c, qmax_c = carry
        qc, ex = quant_chunk(c)
        ymin_j, ymax_j, inr_j, qmin_j, qmax_j = chunk_stats(qc, x0)
        return (jnp.minimum(ex_c, ex),
                jnp.minimum(ymin_c, ymin_j),
                jnp.maximum(ymax_c, ymax_j),
                jnp.minimum(inr_c, inr_j),
                jnp.minimum(qmin_c, qmin_j),
                jnp.maximum(qmax_c, qmax_j))

    ex_min, ymin, ymax, inr_min, qmin, qmax = jax.lax.fori_loop(
        jnp.int32(1), steps, fused_body,
        (ex0, ymin0, ymax0, inr0, qmin0, qmax0))
    all_exact = ex_min == jnp.int32(1)
    in_range = inr_min == jnp.int32(1)

    wwin = ymax - ymin + jnp.int32(1)
    small = wwin <= p // jnp.int32(2)
    m = x0 + ymin
    m = jnp.where(m < zero, m + p, m)
    m = jnp.where(small, m, zero)
    per = (per_ref[i] != zero) if per_static is None else None

    def recenter(qc):
        if per_static is False:
            return qc
        qb = qc + jnp.where(qc < m, p, zero)
        qb = qb - jnp.where(qb >= m + p, p, zero)
        if per_static is True:
            return qb
        return jnp.where(per, qb, qc)

    # recentered min/max without a third sweep (spec.periodic_min_fast
    # proof): small window -> values span [m, m + wwin); wide window ->
    # the greedy result is 0, recenter is the identity on in-range q;
    # non-periodic -> identity.  (Out-of-range blocks are flagged
    # invalid and re-encoded on host, so their stats don't matter.)
    if per_static is None:
        shifted = per & small
    else:
        shifted = small if per_static else jnp.bool_(False)
    mn = jnp.where(shifted, m, qmin)
    mx = jnp.where(shifted, m + wwin - jnp.int32(1), qmax)

    # pass 4: delta -> transpose to tile-major -> per-tile planar pack
    # -> transpose back to stream order, one dense (cs, G*bits) store.
    # ts tiles per dynamic step: Mosaic requires dynamic sublane offsets
    # it can prove are 8-multiples (see pallas_codec._tile_step); tiles
    # within a step are peeled by static value slices.
    from .pallas_codec import _tile_step

    ts = _tile_step(bits)

    def pack_body(c, carry):
        qc = recenter(q_scr[pl.ds(c * np.int32(cs), cs), :]) - mn
        qt_scr[...] = qc.T               # (G*32, cs) in-VMEM transpose

        def step_body(j, carry2):
            tiles = bc(qt_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :],
                       jnp.uint32)       # (ts*32, cs)
            planar = jnp.concatenate(
                [_pack_tile_planar(tiles[u * 32:(u + 1) * 32], bits)
                 for u in range(ts)], axis=0)  # (ts*bits, cs)
            wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :] = \
                bc(planar, jnp.int32)
            return carry2
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                          zero)
        w_ref[pl.ds(np.int32(ro) + c * np.int32(cs), cs), :] = \
            bc(wt_scr[...].T, jnp.uint32)  # (cs, G*bits)
        return carry
    jax.lax.fori_loop(jnp.int32(0), steps, pack_body, zero)

    mn_ref[i] = mn
    maxd_ref[i] = mx - mn
    if per_static is None:
        ok = (in_range | ~per) & all_exact
    elif per_static:
        ok = in_range & all_exact
    else:
        ok = all_exact
    valid_ref[i] = ok.astype(jnp.int32)


def supported_pack_enc(bits: int, n: int, pixels_max: int) -> bool:
    """Shapes the two-dispatch big-block encode handles: the stateless
    pack kernel streams (cs, G*32) chunks, so there is NO upper block
    length cap -- only the group alignment."""
    from .pallas_codec import group_tiles

    g = group_tiles(bits)
    return (0 < bits <= 30 and n % (32 * g * 8) == 0
            and pixels_max < (1 << 24))


def _pack_kernel_group(bits: int, G: int, x_ref, low_ref, b_ref,
                       eb_ref, m0_ref, m1_ref, pix_ref, per_ref, m_ref,
                       mn_ref, w_ref, qt_scr, wt_scr):
    """Stateless chunk pack: re-quantize + recenter with the known
    offset ``m`` + delta vs the known block min + planar pack.  No
    cross-chunk state, so block length is unbounded (the stats come
    from codec.float_block_stats32's fused XLA pass)."""
    from .pallas_codec import _tile_step

    i = pl.program_id(0)
    zero = jnp.int32(0)
    bc = jax.lax.bitcast_convert_type
    xc = x_ref[...]                       # (cs, G*32)
    diff = xc - low_ref[i]
    # slim is sound here because the stats pass certifies with
    # fastdiv.quantize_fast(slim_gate=True), whose flag set is a
    # superset of slim's
    qc, _ = _quantize_limb(diff, b_ref[i], eb_ref[i], m0_ref[i],
                           m1_ref[i], slim=True)
    p = pix_ref[i]
    m = m_ref[i]
    per = per_ref[i] != zero
    qb = qc + jnp.where(qc < m, p, zero)
    qb = qb - jnp.where(qb >= m + p, p, zero)
    qc = jnp.where(per, qb, qc)
    qt_scr[...] = (qc - mn_ref[i]).T      # (G*32, cs) in-VMEM transpose
    ts = _tile_step(bits)

    def step_body(j, carry):
        tiles = bc(qt_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :],
                   jnp.uint32)
        planar = jnp.concatenate(
            [_pack_tile_planar(tiles[u * 32:(u + 1) * 32], bits)
             for u in range(ts)], axis=0)
        wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :] = \
            bc(planar, jnp.int32)
        return carry
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                      zero)
    w_ref[...] = bc(wt_scr[...].T, jnp.uint32)  # (cs, G*bits)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows"))
def pack_float_pallas_group(x2d, low, b, eb, m0, m1, pixels, periodic,
                            m, mn, bits: int, n: int,
                            interpret: bool = False, rows: int = 0):
    """Second dispatch of the big-block encode: (B*t/G, G*32) float32 +
    per-block stats -> (B*t/G, G*bits) packed words at static width
    ``bits``.  Certification comes from the stats pass (same fastdiv
    semantics; ops/validate.py proves quantize_fast == _quantize_limb
    bitwise on the backend)."""
    from .pallas_codec import group_tiles

    g = group_tiles(bits)
    bsz = low.shape[0]
    t_g = (n // 32) // g
    ge = g * 32
    gw = g * bits
    if x2d.shape != (bsz * t_g, ge):
        raise ValueError("x2d must be (B*t/G, G*32), got %s"
                         % (x2d.shape,))
    from .pallas_codec import _pick_r_group

    # chunk rows: an 8-multiple dividing t_g (Mosaic sublane constraint)
    cs = _pick_r_group(t_g, rows, g, bits)
    steps = t_g // cs

    scalar = pl.BlockSpec((bsz,), lambda i, j: (np.int32(0),),
                          memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        functools.partial(_pack_kernel_group, bits, g),
        grid=(bsz, steps),
        in_specs=[pl.BlockSpec((cs, ge),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0)))]
        + [scalar] * 9,
        out_specs=pl.BlockSpec((cs, gw),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((bsz * t_g, gw), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((ge, cs), jnp.int32),
                        pltpu.VMEM((gw, cs), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(x2d,
      low.astype(jnp.float32),
      b.astype(jnp.uint32),
      eb.astype(jnp.int32),
      m0.astype(jnp.uint32),
      m1.astype(jnp.uint32),
      pixels.astype(jnp.int32),
      periodic.astype(jnp.int32),
      m.astype(jnp.int32),
      mn.astype(jnp.int32))


def _pack_q_kernel_group(bits: int, G: int, q_ref, pix_ref, per_ref,
                         m_ref, mn_ref, w_ref, qt_scr, wt_scr):
    """Pack-only chunk kernel: recenter + delta + planar pack of
    ALREADY-QUANTIZED int32 pixel indices.  The quantizer -- half the
    fused kernel's per-element cost -- runs once in the stats pass
    (codec.float_block_stats32(return_q=True)) instead of again here,
    at the price of one 4 B/elem q round trip through HBM."""
    from .pallas_codec import _tile_step

    i = pl.program_id(0)
    zero = jnp.int32(0)
    bc = jax.lax.bitcast_convert_type
    qc = q_ref[...]                       # (cs, G*32) int32
    p = pix_ref[i]
    m = m_ref[i]
    per = per_ref[i] != zero
    qb = qc + jnp.where(qc < m, p, zero)
    qb = qb - jnp.where(qb >= m + p, p, zero)
    qc = jnp.where(per, qb, qc)
    qt_scr[...] = (qc - mn_ref[i]).T      # (G*32, cs) in-VMEM transpose
    ts = _tile_step(bits)

    def step_body(j, carry):
        tiles = bc(qt_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :],
                   jnp.uint32)
        planar = jnp.concatenate(
            [_pack_tile_planar(tiles[u * 32:(u + 1) * 32], bits)
             for u in range(ts)], axis=0)
        wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :] = \
            bc(planar, jnp.int32)
        return carry
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                      zero)
    w_ref[...] = bc(wt_scr[...].T, jnp.uint32)  # (cs, G*bits)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows"))
def pack_q_pallas_group(q2d, pixels, periodic, m, mn, bits: int,
                        n: int, interpret: bool = False,
                        rows: int = 0):
    """(B*t/G, G*32) int32 pixel indices + per-block stats ->
    (B*t/G, G*bits) packed words (the q-reuse big-block second
    dispatch)."""
    from .pallas_codec import _pick_r_group, group_tiles

    g = group_tiles(bits)
    bsz = pixels.shape[0]
    t_g = (n // 32) // g
    ge = g * 32
    gw = g * bits
    if q2d.shape != (bsz * t_g, ge):
        raise ValueError("q2d must be (B*t/G, G*32), got %s"
                         % (q2d.shape,))
    cs = _pick_r_group(t_g, rows, g, bits)
    steps = t_g // cs
    scalar = pl.BlockSpec((bsz,), lambda i, j: (np.int32(0),),
                          memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        functools.partial(_pack_q_kernel_group, bits, g),
        grid=(bsz, steps),
        in_specs=[pl.BlockSpec((cs, ge),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0)))]
        + [scalar] * 4,
        out_specs=pl.BlockSpec((cs, gw),
                               lambda i, j: (i * np.int32(steps) + j,
                                             np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((bsz * t_g, gw), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((ge, cs), jnp.int32),
                        pltpu.VMEM((gw, cs), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(q2d,
      pixels.astype(jnp.int32),
      periodic.astype(jnp.int32),
      m.astype(jnp.int32),
      mn.astype(jnp.int32))


def encode_float_pallas_bigblock(x2d, low, b, eb, m0, m1, pixels,
                                 periodic, bits: int, n: int,
                                 interpret: bool = False,
                                 reuse_q: bool = False):
    """Two-dispatch encode for blocks beyond the fused kernel's 512k
    cap.  Same return contract as :func:`encode_float_pallas_group`.

    ``reuse_q=True`` is the round-5 experiment: the stats pass
    materializes the int32 pixel indices and the pack kernel packs
    them directly, so the quantizer runs once per element.  Measured
    SLOWER on v5e (26.7 vs 35.0 GB/s paired-median at (16->256, 2^21),
    2026-08-20): the q materialization turns the fused stats read into
    a memory-bound read+write pass, costing more than the ~50-op
    re-quantize it saves.  Kept non-default as a tested alternative
    (bytes identical either way; tests/test_pipeline.py)."""
    from . import codec

    bsz = low.shape[0]
    lens = jnp.full((bsz,), n, dtype=jnp.int64)
    if reuse_q:
        mn, maxd, m, valid, q = codec.float_block_stats32(
            x2d.reshape(bsz, n), low.astype(jnp.float32),
            pixels, lens, periodic, b, eb, m0, m1, return_q=True)
        words = pack_q_pallas_group(
            q.reshape(x2d.shape), pixels, periodic, m, mn, bits, n,
            interpret=interpret)
    else:
        mn, maxd, m, valid = codec.float_block_stats32(
            x2d.reshape(bsz, n), low.astype(jnp.float32),
            pixels, lens, periodic, b, eb, m0, m1)
        words = pack_float_pallas_group(
            x2d, low, b, eb, m0, m1, pixels, periodic, m, mn, bits, n,
            interpret=interpret)
    return (words, mn.astype(jnp.int64), maxd.astype(jnp.int64),
            valid)


# ---------------------------------------------------------------------------
# int-group pack kernel: the intGroup encode's second dispatch
# (ref go/group.go:242-255) -- ID columns and other int64 data
# ---------------------------------------------------------------------------


def supported_pack_int(bits: int, n: int) -> bool:
    """Shapes the stateless int pack kernel handles: group alignment
    only -- no block length cap (chunk-streamed) and no pixel bound
    (deltas arrive as u32 limb planes)."""
    from .pallas_codec import group_tiles

    if not 0 < bits <= 64:
        return False
    g = group_tiles(bits)
    return n % (32 * g * 8) == 0


def _pack_int_kernel(bits: int, G: int, dlo_ref, dhi_ref, w_ref,
                     lt_scr, ht_scr, wt_scr):
    """Pure planar pack of pre-computed delta limb planes: the deltas
    (x - min, masked past each block's length) come from one fused XLA
    pass, so the kernel carries no cross-chunk state and no per-block
    scalars -- the grid is flat over row chunks."""
    from .pallas_codec import _tile_step

    zero = jnp.int32(0)
    bc = jax.lax.bitcast_convert_type
    lt_scr[...] = bc(bc(dlo_ref[...], jnp.uint32).T, jnp.int32)
    if dhi_ref is not None:
        ht_scr[...] = bc(bc(dhi_ref[...], jnp.uint32).T, jnp.int32)
    ts = _tile_step(bits)

    def step_body(j, carry):
        lo = bc(lt_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :],
                jnp.uint32)
        if dhi_ref is not None:
            hi = bc(ht_scr[pl.ds(j * np.int32(ts * 32), ts * 32), :],
                    jnp.uint32)
            planar = jnp.concatenate(
                [_pack_tile_planar64(lo[u * 32:(u + 1) * 32],
                                     hi[u * 32:(u + 1) * 32], bits)
                 for u in range(ts)], axis=0)
        else:
            planar = jnp.concatenate(
                [_pack_tile_planar(lo[u * 32:(u + 1) * 32], bits)
                 for u in range(ts)], axis=0)
        wt_scr[pl.ds(j * np.int32(ts * bits), ts * bits), :] = \
            bc(planar, jnp.int32)
        return carry
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // ts), step_body,
                      zero)
    w_ref[...] = bc(wt_scr[...].T, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows"))
def pack_int_pallas_group(dlo2d, dhi2d, bits: int, n: int,
                          interpret: bool = False, rows: int = 0):
    """(B*t/G, G*32) u32 delta limb planes -> (B*t/G, G*bits) packed
    words at static width ``bits`` (1..64).  For ``bits <= 32`` pass
    ``dhi2d=None`` (the low limbs of the wrapping 64-bit subtraction
    ARE the delta -- only 4 B/elem cross HBM).  Rows are the aligned
    2-D view of the (B, t*bits) stream; the byte stream equals
    spec.pack_bits exactly (tests/test_pallas_codec.py)."""
    from .pallas_codec import _pick_r_group, group_tiles

    g = group_tiles(bits)
    ge = g * 32
    gw = g * bits
    if dlo2d.shape[1] != ge:
        raise ValueError("dlo2d must be (B*t/G, G*32), got %s"
                         % (dlo2d.shape,))
    rows_total = dlo2d.shape[0]
    t_g = (n // 32) // g
    cs = _pick_r_group(t_g, rows, g, bits)
    steps = rows_total // cs

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    row_spec = pl.BlockSpec((cs, ge), lambda i: (i, np.int32(0)))
    if bits > 32:
        if dhi2d is None:
            raise ValueError("bits > 32 needs the high limb plane")
        kern = functools.partial(_pack_int_kernel, bits, g)
        in_specs = [row_spec, row_spec]
        args = (dlo2d, dhi2d)
        scratch = [pltpu.VMEM((ge, cs), jnp.int32),
                   pltpu.VMEM((ge, cs), jnp.int32),
                   pltpu.VMEM((gw, cs), jnp.int32)]
    else:
        def kern(dlo_ref, w_ref, lt_scr, wt_scr):
            _pack_int_kernel(bits, g, dlo_ref, None, w_ref, lt_scr,
                             None, wt_scr)
        in_specs = [row_spec]
        args = (dlo2d,)
        scratch = [pltpu.VMEM((ge, cs), jnp.int32),
                   pltpu.VMEM((gw, cs), jnp.int32)]
    return pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cs, gw), lambda i: (i, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((rows_total, gw), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*args)


@functools.partial(jax.jit, static_argnames=("bits", "n", "n_pad",
                                             "interpret"))
def delta_pack_int_pallas(x, mins, lens, bits: int, n: int, n_pad: int,
                          interpret: bool = False):
    """Fused int-block delta+pack through the group kernel: one XLA
    elementwise pass turns (B, n) int64 + per-block mins into masked
    u32 delta limb planes (padded to the kernel alignment ``n_pad``),
    then the stateless planar pack emits the words.  Bit-identical to
    bitpack.delta_pack_batch; the intGroup encode hot loop
    (ref go/group.go:242-255 + go/bit/bit.go:106-131)."""
    from .pallas_codec import group_tiles

    bsz = x.shape[0]
    g = group_tiles(bits)
    if x.shape[1] != n:
        raise ValueError("x is (B, %d) but n=%d" % (x.shape[1], n))
    mask = jax.lax.broadcasted_iota(
        jnp.int64, (1, x.shape[1]), 1) < lens[:, None]
    d = jnp.where(mask, x - mins[:, None], 0)
    if n_pad != x.shape[1]:
        d = jnp.pad(d, ((0, 0), (0, n_pad - x.shape[1])))
    t_g = (n_pad // 32) // g
    if bits <= 32:
        # the wrapping low-limb difference IS the delta for widths <= 32
        dlo = d.astype(jnp.uint32).reshape(bsz * t_g, g * 32)
        words = pack_int_pallas_group(dlo, None, bits, n_pad,
                                      interpret=interpret)
    else:
        from . import bitpack

        dlo, dhi = bitpack.split_u64(d.astype(jnp.uint64))
        words = pack_int_pallas_group(
            dlo.reshape(bsz * t_g, g * 32),
            dhi.reshape(bsz * t_g, g * 32), bits, n_pad,
            interpret=interpret)
    return words.reshape(bsz, t_g * g * bits)


@functools.partial(jax.jit, static_argnames=("bits", "n", "interpret",
                                             "rows", "kpb_cap", "psem",
                                             "const_cfg"))
def encode_float_pallas_group(x2d, low, b, eb, m0, m1, pixels, periodic,
                              bits: int, n: int, interpret: bool = False,
                              rows: int = 0, kpb_cap: int = 128,
                              psem: bool = False, const_cfg=None):
    """Group-aligned fused encode: (B*t/G, G*32) float32 (row-major
    identical to (B, n)) -> ((B*t/G, G*bits) words, mins, maxd, valid).

    Same contract as :func:`encode_float_pallas` -- the words rows are
    the aligned 2-D view of the (B, t*bits) stream (free host reshape).

    ``const_cfg``: optional static ``(low, b, eb, m0, m1, pixels,
    periodic)`` tuple of Python scalars -- the column-constant
    specialization (all blocks of a minh column share these): the seven
    SMEM scalar operands disappear and the quantizer/periodic logic
    compiles against constants (see _encode_group_block).  The traced
    scalar arrays are then ignored except for the block count; bytes
    are identical either way (same arithmetic on constant operands;
    certified alongside the generic kernel by ops/validate)."""
    from .pallas_codec import group_tiles

    g = group_tiles(bits)
    bsz = low.shape[0]
    t = n // 32
    t_g = t // g
    ge = g * 32
    gw = g * bits
    if x2d.shape != (bsz * t_g, ge):
        raise ValueError("x2d must be (B*t/G, G*32), got %s"
                         % (x2d.shape,))
    from .pallas_codec import _pick_r_group

    # chunk rows: an 8-multiple dividing t_g (Mosaic sublane constraint)
    cs = _pick_r_group(t_g, rows, g, bits)

    # merge kpb consecutive blocks per grid instance at small t_g (the
    # per-instance overhead otherwise dominates; see the kernel doc).
    # kpb_cap bounds the rows per instance: in+out DMA staging is
    # kpb*t_g*(ge + gw)*4 bytes, double-buffered by the pipeline, so
    # the cap must keep that under the ~16 MB scoped-VMEM budget.
    kpb = 1
    if not rows and t_g < kpb_cap:
        for cand in range(min(kpb_cap // t_g, bsz), 0, -1):
            if bsz % cand == 0:
                kpb = cand
                break

    scalar = pl.BlockSpec((bsz,), lambda i: (np.int32(0),),
                          memory_space=pltpu.SMEM)
    kwargs = {}
    if psem and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    if const_cfg is not None:
        def kern(x_ref, w_ref, mn_ref, maxd_ref, valid_ref,
                 q_scr, qt_scr, wt_scr):
            _encode_kernel_group(
                bits, g, cs, kpb, t_g, x_ref, None, None, None, None,
                None, None, None, w_ref, mn_ref, maxd_ref, valid_ref,
                q_scr, qt_scr, wt_scr, cfg=const_cfg)
        in_specs = [pl.BlockSpec((kpb * t_g, ge),
                                 lambda i: (i, np.int32(0)))]
        args = (x2d,)
    else:
        kern = functools.partial(_encode_kernel_group, bits, g, cs,
                                 kpb, t_g)
        in_specs = [pl.BlockSpec((kpb * t_g, ge),
                                 lambda i: (i, np.int32(0)))] \
            + [scalar] * 7
        args = (x2d,
                low.astype(jnp.float32),
                b.astype(jnp.uint32),
                eb.astype(jnp.int32),
                m0.astype(jnp.uint32),
                m1.astype(jnp.uint32),
                pixels.astype(jnp.int32),
                periodic.astype(jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=(bsz // kpb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((kpb * t_g, gw), lambda i: (i, np.int32(0))),
            scalar,
            scalar,
            scalar,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * t_g, gw), jnp.uint32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((t_g, ge), jnp.int32),
                        pltpu.VMEM((ge, cs), jnp.int32),
                        pltpu.VMEM((gw, cs), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(*args)
    words, mins, maxd, valid = out
    return (words, mins.astype(jnp.int64), maxd.astype(jnp.int64),
            valid != 0)
