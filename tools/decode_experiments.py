"""On-chip decode-formulation experiments (VERDICT round-2 item 2).

Round-1 decode (34 GB/s slope) is 4x behind encode (141).  Suspects: the
unpack's ``(t, bits)`` reshape+transpose and the (bits, T) row gather
(ops/bitpack.py _unpack_tiles) -- intermediates whose minor dim is
``bits`` (18) occupy 18/128 lanes.  This script measures, on the real
chip:

* attribution: pure-streaming ceiling, transpose-only, gather-only
* full-decode variants (current, fused-batch transpose, lane-gather,
  broadcast-concat)

Each experiment is selected by argv[1] so a Mosaic compile stall in one
variant (round-1 saw a >30 min remote-compile hang on a static lane
gather) cannot wedge the rest: drive with tools/run_decode_experiments.sh
which applies a per-run timeout.

Usage: python tools/decode_experiments.py <name>
Names: list | ceiling | transpose | gather | v0_current | v1_concat |
       v2_lanegather | v3_flatT | all-safe
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


BITS = 18
B = 64
N_SMALL = 1 << 17
N_LARGE = 1 << 21


def _time(fn, *args, iters=5, reps=6, sync=None):
    sync = sync or (lambda o: o)
    np.asarray(sync(fn(*args)))
    np.asarray(sync(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(sync(o))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _slope(fn, make_args, sync):
    a1, by1 = make_args(N_SMALL)
    t1 = _time(fn, *a1, sync=sync)
    a2, by2 = make_args(N_LARGE)
    t2 = _time(fn, *a2, sync=sync)
    dt = t2 - t1
    if dt > 1e-6 and (by2 - by1) / 1e9 / dt < 2000:
        return (by2 - by1) / 1e9 / dt, by2 / 1e9 / t2
    return by2 / 1e9 / t2, by2 / 1e9 / t2


def _words(n, b=B, bits=BITS, seed=0):
    """Random packed words for b blocks of n elements at width bits, plus
    the uncompressed byte count (the throughput denominator)."""
    import jax

    from minnow_tpu.ops import bitpack

    rng = np.random.default_rng(seed)
    t = n // 32
    w = rng.integers(0, 1 << 32, (b, t * bits), dtype=np.uint64)
    w = w.astype(np.uint32)
    return jax.device_put(w), b * n * 4


# ---------------------------------------------------------------------------
# attribution experiments
# ---------------------------------------------------------------------------


def exp_ceiling():
    """Pure streaming: read words, write same-size u32 -> the copy
    ceiling in output-byte terms (words are bits/32 of output bytes)."""
    import jax

    @jax.jit
    def f(w):
        return w + np.uint32(1)

    def make(n):
        w, by = _words(n)
        return (w,), by

    s, large = _slope(f, make, sync=lambda o: o[0, :1])
    return {"slope_GBps": s, "large_GBps": large}


def exp_transpose():
    """Just the (B, t, bits) -> (B, bits, t) transpose, materialized."""
    import jax

    @jax.jit
    def f(w):
        b, wn = w.shape
        t = wn // BITS
        return w.reshape(b, t, BITS).transpose(0, 2, 1) + np.uint32(1)

    def make(n):
        w, by = _words(n)
        return (w,), by

    s, large = _slope(f, make, sync=lambda o: o[0, :1, :1])
    return {"slope_GBps": s, "large_GBps": large}


def exp_gather():
    """Row gather (B, bits, t)[w32] -> (B, 32, t) from a pre-transposed
    operand, materialized (no shifts)."""
    import jax

    offs = np.arange(32, dtype=np.int64) * BITS
    w_idx = np.minimum(offs // 32, BITS - 1)

    @jax.jit
    def f(wt):
        return wt[:, w_idx, :] + np.uint32(1)

    def make(n):
        w, by = _words(n)
        t = n // 32
        wt = np.asarray(w).reshape(B, t, BITS).transpose(0, 2, 1).copy()
        import jax as _j

        return (_j.device_put(wt),), by

    s, large = _slope(f, make, sync=lambda o: o[0, :1, :1])
    return {"slope_GBps": s, "large_GBps": large}


# ---------------------------------------------------------------------------
# full decode variants (words -> q u32, byte-identical contract)
# ---------------------------------------------------------------------------


def _variant_current():
    import jax

    from minnow_tpu.ops import bitpack

    return jax.jit(lambda w, n: bitpack.unpack_batch32(w, BITS, n),
                   static_argnames=("n",))


def _variant_flat_transpose():
    """One fused batch transpose: (B*t, bits) -> (bits, B*t), gather,
    shift, transpose back.  Avoids B separate small transposes under
    vmap."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        wt = w.reshape(b * t, BITS).T  # (bits, B*t)
        a = wt[w1]  # (32, B*t)
        c = wt[w2]
        out = a >> s[:, None]
        out = out | jnp.where((s > 0)[:, None], c << s2[:, None],
                              jnp.uint32(0))
        out = (out & mask).T.reshape(b, t * 32)
        return out[:, :n]

    return jax.jit(f, static_argnames=("n",))


def _variant_lane_gather():
    """No transposes at all: gather word columns along the lane axis of
    the natural (B, t, bits) layout -> (B, t, 32)."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        wt = w.reshape(b, t, BITS)
        a = jnp.take(wt, w1, axis=2)  # (B, t, 32)
        c = jnp.take(wt, w2, axis=2)
        out = a >> s[None, None, :]
        out = out | jnp.where((s > 0)[None, None, :], c << s2[None, None, :],
                              jnp.uint32(0))
        return (out & mask).reshape(b, t * 32)[:, :n]

    return jax.jit(f, static_argnames=("n",))


def _variant_concat():
    """Gather replaced by concat-of-broadcast word rows (the structural
    inverse of pack's slice+segment-sum)."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = offs // 32
    w2 = np.minimum(w1 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def expand(wt, idx):
        # wt: (B, bits, t); idx: (32,) monotone word ids -> (B, 32, t)
        pieces = []
        j = 0
        while j < 32:
            k = j
            while k < 32 and idx[k] == idx[j]:
                k += 1
            row = wt[:, int(idx[j]):int(idx[j]) + 1, :]
            pieces.append(jnp.broadcast_to(
                row, (row.shape[0], k - j, row.shape[2])))
            j = k
        return jnp.concatenate(pieces, axis=1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        wt = w.reshape(b, t, BITS).transpose(0, 2, 1)
        a = expand(wt, w1)
        c = expand(wt, w2)
        out = a >> s[None, :, None]
        out = out | jnp.where((s > 0)[None, :, None],
                              c << s2[None, :, None], jnp.uint32(0))
        out = (out & mask).transpose(0, 2, 1).reshape(b, t * 32)
        return out[:, :n]

    return jax.jit(f, static_argnames=("n",))


VARIANTS = {
    "v0_current": _variant_current,
    "v1_concat": _variant_concat,
    "v2_lanegather": _variant_lane_gather,
    "v3_flatT": _variant_flat_transpose,
}


def run_variant(name):
    import jax

    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack

    fn = VARIANTS[name]()

    # correctness first: byte-identical to the normative host spec,
    # checked through jit on this backend
    rng = np.random.default_rng(3)
    n_val = 4096
    vals = rng.integers(0, 1 << BITS, (4, n_val), dtype=np.uint64)
    words = np.stack([
        np.frombuffer(
            spec.pack_bits(v, BITS)
            + b"\0" * (bitpack.words_per_block(BITS, n_val) * 4
                       - spec.array_bytes(BITS, n_val)),
            dtype="<u4")
        for v in vals])
    got = np.asarray(fn(jax.device_put(words), n_val))
    if not (got.astype(np.uint64) == vals).all():
        return {"error": "MISMATCH: %s not byte-exact" % name}

    def make(n):
        w, by = _words(n)
        return (w, n), by

    s, large = _slope(fn, make, sync=lambda o: o[0, :1])
    return {"slope_GBps": s, "large_GBps": large, "exact": True}


def main():
    name = sys.argv[1]
    if name == "list":
        print(json.dumps(["ceiling", "transpose", "gather"]
                         + list(VARIANTS)))
        return
    _setup()
    import jax

    dev = str(jax.devices()[0])
    if name == "ceiling":
        out = exp_ceiling()
    elif name == "transpose":
        out = exp_transpose()
    elif name == "gather":
        out = exp_gather()
    elif name == "transpose_aligned":
        out = exp_transpose_aligned()
    elif name.startswith("pgroup"):
        # pgroup | pgroup_r64 | pgroup_r256 | pgroup_unpack[_rNN]
        fused = "unpack" not in name
        rows = 0
        if "_r" in name:
            rows = int(name.rsplit("_r", 1)[1])
        out = exp_pgroup(rows=rows, fused=fused)
    else:
        out = run_variant(name)
    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    out.update({"exp": name, "device": dev})
    print(json.dumps(out), flush=True)


def _variant_staged():
    """Two explicitly materialized XLA stages: (1) the (B,t,bits) ->
    (B,bits,t) transpose alone, (2) gather+shift+mask fused.  The
    one-dispatch XLA graph fuses these badly (34 GB/s vs 88-GB/s
    transpose + 414-GB/s gather when measured separately); the barrier
    forces the fast schedule."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        wt = w.reshape(b, t, BITS).transpose(0, 2, 1)
        wt = jax.lax.optimization_barrier(wt)  # materialize stage 1
        a = wt[:, w1, :]  # (B, 32, t)
        c = wt[:, w2, :]
        out = a >> s[None, :, None]
        out = out | jnp.where((s > 0)[None, :, None],
                              c << s2[None, :, None], jnp.uint32(0))
        out = (out & mask).transpose(0, 2, 1).reshape(b, t * 32)
        return out[:, :n]

    return jax.jit(f, static_argnames=("n",))


def _variant_staged3():
    """Three stages: transpose | gather+shift -> (B,32,t) | transpose
    back -- every stage materialized, none fused with another."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        wt = w.reshape(b, t, BITS).transpose(0, 2, 1)
        wt = jax.lax.optimization_barrier(wt)
        a = wt[:, w1, :]
        c = wt[:, w2, :]
        out = a >> s[None, :, None]
        out = out | jnp.where((s > 0)[None, :, None],
                              c << s2[None, :, None], jnp.uint32(0))
        out = out & mask
        out = jax.lax.optimization_barrier(out)
        return out.transpose(0, 2, 1).reshape(b, t * 32)[:, :n]

    return jax.jit(f, static_argnames=("n",))


VARIANTS["v4_staged"] = _variant_staged
VARIANTS["v5_staged3"] = _variant_staged3


def _variant_twodispatch():
    """Two SEPARATE jit dispatches: the transpose alone, then the
    gather+shift fused -- optimization_barrier does not stop XLA fusion
    (round-1 finding), so real dispatch boundaries are the only way to
    force the 88 + 414 GB/s schedule measured for the isolated stages."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    @jax.jit
    def stage1(w):
        b, wn = w.shape
        t = wn // BITS
        return w.reshape(b, t, BITS).transpose(0, 2, 1)

    @functools_partial_jit
    def stage2(wt, n):
        b = wt.shape[0]
        t = wt.shape[2]
        a = wt[:, w1, :]
        c = wt[:, w2, :]
        out = a >> s[None, :, None]
        out = out | jnp.where((s > 0)[None, :, None],
                              c << s2[None, :, None], jnp.uint32(0))
        out = (out & mask).transpose(0, 2, 1).reshape(b, t * 32)
        return out[:, :n]

    def f(w, n):
        return stage2(stage1(w), n)

    return f


def functools_partial_jit(fn):
    import functools

    import jax

    return jax.jit(fn, static_argnames=("n",))


VARIANTS["v6_twodispatch"] = _variant_twodispatch


def _variant_stride():
    """De-interleave via BITS strided lane slices of the FLAT words --
    no (.., bits)-minor intermediate ever materializes (those get
    lane-padded 128/bits in HBM, the suspected root cause of the 30
    GB/s wall).  All intermediates are (B, t) or (B, 32, t) with a big
    clean minor dim; the single final transpose+reshape to flat fuses
    into one copy."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = np.minimum(offs // 32, BITS - 1)
    w2 = np.minimum(offs // 32 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        rows = [jax.lax.slice(w, (0, k), (b, (t - 1) * BITS + k + 1),
                              (1, BITS)) for k in range(BITS)]
        outs = []
        for j in range(32):
            o = rows[int(w1[j])] >> s[j]
            if s[j]:
                o = o | (rows[int(w2[j])] << s2[j])
            outs.append(o & mask)
        q = jnp.stack(outs, axis=1)  # (B, 32, t)
        return q.transpose(0, 2, 1).reshape(b, t * 32)[:, :n]

    return jax.jit(f, static_argnames=("n",))


def _variant_mxu():
    """De-interleave on the MXU: words viewed as bytes, multiplied by a
    banded (16*bits, 128) matrix of 2^{0,8,16} entries -- one bf16
    non-overlapping conv (stride == window) whose channels-last output
    is already in element order with a clean 128-lane minor dim.

    Exactness: each output is byte0 + 256*byte1 + 65536*byte2 < 2^24;
    every partial sum is a nonnegative integer below that, so bf16
    (exact for 0..255 and for 2^k) inputs with f32 MXU accumulation are
    bit-exact.  The element's value sits at bit (bits*lane)&7 of the
    window (<= 6 for even bits <= 18), extracted by a per-lane static
    shift in the epilogue.  No transposes, no gathers, no padded
    layouts anywhere."""
    import jax
    import jax.numpy as jnp

    cb = 16 * BITS  # bytes per 128-element chunk
    g = np.zeros((cb, 128), np.float32)
    for j in range(128):
        c = (BITS * j) >> 3
        for k in range(3):
            g[c + k, j] = float(1 << (8 * k))
    gb = jnp.asarray(g, jnp.bfloat16).reshape(cb, 1, 128)  # WIO
    shift = jnp.asarray([(BITS * j) & 7 for j in range(128)], jnp.int32)
    mask = jnp.int32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        nc = n // 128
        bytes_ = jax.lax.bitcast_convert_type(
            w, jnp.uint8).reshape(b, wn * 4)[:, :nc * cb]
        xb = bytes_.astype(jnp.bfloat16)[..., None]  # (B, L, 1) NWC
        q = jax.lax.conv_general_dilated(
            xb, gb, window_strides=(cb,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)  # (B, nc, 128) f32
        qi = (q.astype(jnp.int32) >> shift[None, None, :]) & mask
        return qi.reshape(b, nc * 128).astype(jnp.uint32)

    return jax.jit(f, static_argnames=("n",))


def _variant_mxu_dot():
    """Same banded-matmul de-interleave as v8 but via an explicit
    reshape + dot_general instead of a conv, to measure whether XLA's
    conv lowering or the (.., 16*bits)-minor reshape is the better
    route."""
    import jax
    import jax.numpy as jnp

    cb = 16 * BITS
    g = np.zeros((cb, 128), np.float32)
    for j in range(128):
        c = (BITS * j) >> 3
        for k in range(3):
            g[c + k, j] = float(1 << (8 * k))
    gb = jnp.asarray(g, jnp.bfloat16)
    shift = jnp.asarray([(BITS * j) & 7 for j in range(128)], jnp.int32)
    mask = jnp.int32((1 << BITS) - 1)

    def f(w, n):
        b, wn = w.shape
        nc = n // 128
        bytes_ = jax.lax.bitcast_convert_type(
            w, jnp.uint8).reshape(b, wn * 4)[:, :nc * cb]
        xb = bytes_.reshape(b, nc, cb).astype(jnp.bfloat16)
        q = jax.lax.dot_general(
            xb, gb, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (B, nc, 128)
        qi = (q.astype(jnp.int32) >> shift[None, None, :]) & mask
        return qi.reshape(b, nc * 128).astype(jnp.uint32)

    return jax.jit(f, static_argnames=("n",))


VARIANTS["v7_stride"] = _variant_stride
VARIANTS["v8_mxu"] = _variant_mxu
VARIANTS["v9_mxudot"] = _variant_mxu_dot


def _variant_group64():
    """All-aligned chain: every materialized intermediate keeps a
    128-multiple minor dim, unlike v0-v9 whose (…, 18) / (…, 32)
    intermediates waste 7x/4x lanes in tiled HBM layout.

    flat words (B, t*18) -> 64-tile groups (B*t/64, 1152 = 9*128)
    -> aligned 2-D transpose (1152, M) -> static row gather to
    (2048, M) (64 tiles x 32 elements; rows never cross a group, spill
    clamp proof: with s>14 the spill word index is <= 17) -> vector
    shift/combine -> aligned back-transpose (M, 2048) -> reshape
    (B, n)."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = offs // 32
    w2 = np.minimum(w1 + 1, BITS - 1)  # clamped spill: masked anyway
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)

    k = np.arange(64, dtype=np.int64)
    rows_a = (k[:, None] * BITS + w1[None, :]).reshape(-1)  # (2048,)
    rows_b = (k[:, None] * BITS + w2[None, :]).reshape(-1)
    s_col = np.tile(s, 64)[:, None]                         # (2048, 1)
    s2_col = np.tile(s2, 64)[:, None].astype(np.uint32)
    spill = np.tile(s > 0, 64)[:, None]

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        g = t // 64
        m = b * g
        wt = w.reshape(m, 1152).T          # aligned transpose
        a = wt[rows_a]                      # (2048, m) static row gather
        c = wt[rows_b]
        out = a >> s_col
        out = out | jnp.where(spill, c << s2_col, jnp.uint32(0))
        out = (out & mask).T.reshape(b, g * 2048)
        return out[:, :n]

    return jax.jit(f, static_argnames=("n",))


def _variant_group64_barrier():
    """group64 with each stage materialized via optimization_barrier
    (in case XLA fuses the aligned chain into a slow loop)."""
    import jax
    import jax.numpy as jnp

    offs = np.arange(32, dtype=np.int64) * BITS
    s = (offs % 32).astype(np.uint32)
    w1 = offs // 32
    w2 = np.minimum(w1 + 1, BITS - 1)
    s2 = ((32 - s) % 32).astype(np.uint32)
    mask = np.uint32((1 << BITS) - 1)
    k = np.arange(64, dtype=np.int64)
    rows_a = (k[:, None] * BITS + w1[None, :]).reshape(-1)
    rows_b = (k[:, None] * BITS + w2[None, :]).reshape(-1)
    s_col = np.tile(s, 64)[:, None]
    s2_col = np.tile(s2, 64)[:, None].astype(np.uint32)
    spill = np.tile(s > 0, 64)[:, None]

    def f(w, n):
        b, wn = w.shape
        t = wn // BITS
        g = t // 64
        m = b * g
        wt = w.reshape(m, 1152).T
        wt = jax.lax.optimization_barrier(wt)
        a = wt[rows_a]
        c = wt[rows_b]
        out = a >> s_col
        out = out | jnp.where(spill, c << s2_col, jnp.uint32(0))
        out = out & mask
        out = jax.lax.optimization_barrier(out)
        out = out.T.reshape(b, g * 2048)
        return out[:, :n]

    return jax.jit(f, static_argnames=("n",))


def exp_transpose_aligned():
    """Aligned 2-D transpose only: (M, 1152) -> (1152, M), both dims
    128/8-multiples -- the layout-cost model says this should beat the
    88 GB/s measured for the lane-padded (t, 18) transpose."""
    import jax

    @jax.jit
    def f(w):
        b, wn = w.shape
        m = b * (wn // BITS) // 64
        return w.reshape(m, 1152).T + np.uint32(1)

    def make(n):
        w, by = _words(n)
        return (w,), by

    s, large = _slope(f, make, sync=lambda o: o[:1, 0])
    return {"slope_GBps": s, "large_GBps": large}


VARIANTS["v10_group64"] = _variant_group64
VARIANTS["v11_group64b"] = _variant_group64_barrier


def exp_pgroup(rows=0, fused=True):
    """The aligned-group Pallas kernel (ops/pallas_codec.py
    *_pallas_group): words pre-shaped (M, G*bits) on host (free), ONE
    kernel, dense in/out HBM refs.  ``fused`` measures the production
    decode (unpack+dequant -> f32); else the raw unpack."""
    import jax

    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, pallas_codec

    G = pallas_codec.group_tiles(BITS)
    gw = G * BITS

    # correctness vs the normative host spec, through jit on this
    # backend
    rng = np.random.default_rng(3)
    n_val = 32 * G * 8
    vals = rng.integers(0, 1 << BITS, (4, n_val), dtype=np.uint64)
    words = np.stack([
        np.frombuffer(
            spec.pack_bits(v, BITS)
            + b"\0" * (bitpack.words_per_block(BITS, n_val) * 4
                       - spec.array_bytes(BITS, n_val)),
            dtype="<u4")
        for v in vals])
    got = np.asarray(pallas_codec.unpack_pallas_group(
        jax.device_put(words.reshape(-1, gw)), BITS, n_val,
        rows=rows))
    if not (got.reshape(4, n_val).astype(np.uint64) == vals).all():
        return {"error": "MISMATCH: pgroup not byte-exact on chip"}

    if fused:
        scal = {
            "mins": np.zeros(B, np.int64),
            "low": np.zeros(B, np.float32),
            "high": np.full(B, 250.0, np.float32),
            "pixels": np.full(B, 250000, np.int64),
            "periodic": np.ones(B, bool),
        }

        def f(w2d, n):
            return pallas_codec.decode_float_pallas_group(
                w2d, scal["mins"], scal["low"], scal["high"],
                scal["pixels"], scal["periodic"], BITS, n,
                dither="none", rows=rows)
    else:
        def f(w2d, n):
            return pallas_codec.unpack_pallas_group(w2d, BITS, n,
                                                    rows=rows)

    def make(n):
        w, by = _words(n)
        w2d = jax.device_put(np.asarray(w).reshape(-1, gw))
        return (w2d, n), by

    s, large = _slope(f, make, sync=lambda o: o[:1, 0])
    return {"slope_GBps": s, "large_GBps": large, "exact": True,
            "rows": rows}


if __name__ == "__main__":
    main()
