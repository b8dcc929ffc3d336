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

B = 64
BITS = 18
N1 = 1 << 21
N2 = 1 << 23


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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from minnow_tpu.ops import bitpack, codec, pallas_codec

    dev = str(jax.devices()[0])
    rng = np.random.default_rng(9)
    g = pallas_codec.group_tiles(BITS)

    def make(n):
        t = n // 32
        w = rng.integers(0, 1 << 32, (B, t * BITS),
                         dtype=np.uint64).astype(np.uint32)
        # in-range pixel values irrelevant for timing; mask to width so
        # the +min/bound path sees plausible magnitudes
        mins = np.zeros(B, np.int64)
        lowv = np.zeros(B, np.float32)
        highv = np.full(B, 250.0, np.float32)
        pixv = np.full(B, 250000, np.int64)
        per = np.ones(B, bool)
        return w, mins, lowv, highv, pixv, per, B * n * 4

    def xla_decode(n):
        @jax.jit
        def decode(words, mins, lowv, highv, pixv):
            q = bitpack.unpack_batch32(words, BITS, n).astype(jnp.int32) \
                + mins[:, None]
            q = codec.bound(q, 0, pixv[:, None].astype(jnp.int32))
            return codec.dequantize24(q, lowv[:, None], highv[:, None],
                                      pixv[:, None])

        w, mins, lowv, highv, pixv, per, by = make(n)
        args = tuple(jax.device_put(a)
                     for a in (w, mins, lowv, highv, pixv))
        return _time(decode, *args, sync=lambda o: o[0, :1]), by

    def pg_decode(n, rows):
        w, mins, lowv, highv, pixv, per, by = make(n)
        w2d = jax.device_put(w.reshape(-1, g * BITS))

        def decode(w2d, mins, lowv, highv, pixv, per):
            return pallas_codec.decode_float_pallas_group(
                w2d, mins, lowv, highv, pixv, per, BITS, n,
                dither="none", rows=rows)

        args = (w2d, mins, lowv, highv, pixv, per)
        return _time(decode, *args), by

    for name, fn in [("xla", xla_decode),
                     ("pg_r0", lambda n: pg_decode(n, 0)),
                     ("pg_r512", lambda n: pg_decode(n, 512))]:
        t1, by1 = fn(N1)
        t2, by2 = fn(N2)
        dt = t2 - t1
        print(json.dumps({
            "exp": name, "t_2e21_ms": round(t1 * 1e3, 2),
            "t_2e23_ms": round(t2 * 1e3, 2),
            "slope_GBps": round((by2 - by1) / 1e9 / dt, 2)
            if dt > 1e-4 else None,
            "large_GBps": round(by2 / 1e9 / t2, 2),
            "device": dev,
        }), flush=True)


if __name__ == "__main__":
    main()
