"""On-chip tuning of the fused Pallas decode kernel: layout x rows.

Validates byte-exactness per variant, then slope-times it.
Usage: python tools/pallas_decode_tune.py <layout> <rows>
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time(fn, *args, iters=5, reps=6):
    sync = lambda o: o[0, :1]  # noqa: E731
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


def main():
    layout = sys.argv[1]
    rows = int(sys.argv[2])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, codec, pallas_codec

    out = {"layout": layout, "rows": rows,
           "device": str(jax.devices()[0])}
    rng = np.random.default_rng(3)
    bits, pixels = 18, 250000

    # byte-exactness at a shape whose t is divisible by the rows setting
    n_val = max(32 * rows * 2, 4096) if rows else 4096
    b_val = 4
    vals = rng.integers(0, pixels, (b_val, n_val), dtype=np.uint64)
    words = np.stack([
        np.frombuffer(
            spec.pack_bits(v, bits)
            + b"\0" * (bitpack.words_per_block(bits, n_val) * 4
                       - spec.array_bytes(bits, n_val)), dtype="<u4")
        for v in vals])
    mins = rng.integers(-3, 3, b_val).astype(np.int64)
    low = np.full(b_val, 0.0, np.float32)
    high = np.full(b_val, 250.0, np.float32)
    pix = np.full(b_val, pixels, np.int64)
    per = np.ones(b_val, bool)
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, np.arange(b_val), bits,
        n_val, dither="none"))
    mine = np.asarray(pallas_codec.decode_float_pallas(
        words, mins, low, high, pix, per, bits, n_val, dither="none",
        layout=layout, rows=rows))
    out["exact"] = bool((ref.view(np.uint32) == mine.view(np.uint32)).all())
    if not out["exact"]:
        print(json.dumps(out), flush=True)
        return

    b = 64

    def run(n):
        t = n // 32
        w = rng.integers(0, 1 << 32, (b, t * bits),
                         dtype=np.uint64).astype(np.uint32)
        args = (jax.device_put(w), jax.device_put(np.zeros(b, np.int64)),
                jax.device_put(np.full(b, 0.0, np.float32)),
                jax.device_put(np.full(b, 250.0, np.float32)),
                jax.device_put(np.full(b, pixels, np.int64)),
                jax.device_put(np.ones(b, bool)))

        def fn(w_, mn, lo, hi, px, pr):
            return pallas_codec.decode_float_pallas(
                w_, mn, lo, hi, px, pr, bits, n, dither="none",
                layout=layout, rows=rows)

        return _time(fn, *args), b * n * 4

    t1, by1 = run(1 << 17)
    t2, by2 = run(1 << 21)
    out["slope_GBps"] = round((by2 - by1) / 1e9 / (t2 - t1), 3) \
        if t2 > t1 else None
    out["large_GBps"] = round(by2 / 1e9 / t2, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
