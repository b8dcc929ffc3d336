"""Wide-spread on-chip decode slope: XLA path vs group-aligned Pallas.

Earlier slope measurements between (64, 2^17) and (64, 2^21) disagreed
wildly across runs (19.9 vs 171.8 GB/s for the same group kernel): the
time delta at those sizes is a few ms, the same order as tunnel noise on
top of the ~25 ms dispatch floor.  This check times (64, 2^21) ->
(64, 2^23) -- a 1.6 GB output spread -- so the candidate rates separate
by tens of ms and one run settles the question.

Prints one JSON line per experiment with both absolute times and the
slope.  Usage: python tools/decode_slope_check.py
"""

from __future__ import annotations

import json
import time

import numpy as np

BITS = 18
N = 1 << 21
B1 = 64
B2 = 512


def _time(fn, *args, iters=3, reps=5, sync=None):
    """Per-dispatch timing with an immediate sync each iteration: at
    (64, 2^23) each output is 2.15 GB, so holding several in flight
    OOMs the 16 GB HBM (first run died RESOURCE_EXHAUSTED).  The
    serialized round-trip floor is identical at both sizes and cancels
    in the slope."""
    sync = sync or (lambda o: o[:1, 0])
    np.asarray(sync(fn(*args)))
    np.asarray(sync(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(sync(fn(*args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from minnow_tpu.ops import bitpack, codec, pallas_codec

    dev = str(jax.devices()[0])
    rng = np.random.default_rng(9)
    g = pallas_codec.group_tiles(BITS)

    def make(b):
        t = N // 32
        w = rng.integers(0, 1 << 32, (b, t * BITS),
                         dtype=np.uint64).astype(np.uint32)
        # in-range pixel values irrelevant for timing; mask to width so
        # the +min/bound path sees plausible magnitudes
        mins = np.zeros(b, np.int64)
        lowv = np.zeros(b, np.float32)
        highv = np.full(b, 250.0, np.float32)
        pixv = np.full(b, 250000, np.int64)
        per = np.ones(b, bool)
        return w, mins, lowv, highv, pixv, per, b * N * 4

    def xla_decode(b):
        @jax.jit
        def decode(words, mins, lowv, highv, pixv):
            q = bitpack.unpack_batch32(words, BITS, N).astype(jnp.int32) \
                + mins[:, None]
            q = codec.bound(q, 0, pixv[:, None].astype(jnp.int32))
            return codec.dequantize24(q, lowv[:, None], highv[:, None],
                                      pixv[:, None])

        w, mins, lowv, highv, pixv, per, by = make(b)
        args = tuple(jax.device_put(a)
                     for a in (w, mins, lowv, highv, pixv))
        return _time(decode, *args, sync=lambda o: o[0, :1]), by

    def pg_decode(b, rows):
        w, mins, lowv, highv, pixv, per, by = make(b)
        w2d = jax.device_put(w.reshape(-1, g * BITS))

        def decode(w2d, mins, lowv, highv, pixv, per):
            return pallas_codec.decode_float_pallas_group(
                w2d, mins, lowv, highv, pixv, per, BITS, N,
                dither="none", rows=rows)

        args = (w2d, mins, lowv, highv, pixv, per)
        return _time(decode, *args), by

    # rows=512 exceeds the 16 MB scoped-VMEM stack (18.75M, measured);
    # 256 is the largest safe setting.  The XLA path's unpack gather
    # materializes ~3x the output in intermediates, so its large point
    # stays at b=256 (b=512 OOMed 16 GB HBM); its slope resolves anyway
    # because the path is slow.
    for name, fn, b2 in [("xla", xla_decode, 256),
                         ("pg_r0", lambda b: pg_decode(b, 0), B2),
                         ("pg_r256", lambda b: pg_decode(b, 256), B2)]:
        t1, by1 = fn(B1)
        t2, by2 = fn(b2)
        dt = t2 - t1
        print(json.dumps({
            "exp": name, "b": [B1, b2],
            "t_small_ms": round(t1 * 1e3, 2),
            "t_large_ms": round(t2 * 1e3, 2),
            "slope_GBps": round((by2 - by1) / 1e9 / dt, 2)
            if dt > 1e-4 else None,
            "large_GBps": round(by2 / 1e9 / t2, 2),
            "device": dev,
        }), flush=True)


if __name__ == "__main__":
    main()
