"""Round-5 chip tuning session: big-block decode rows sweep + big-block
group-encode cap lift, both with the paired-median estimator.

Run AFTER bench.py finishes (never two TPU processes at once).
Usage: python tools/r5_chip_tune.py [decode|encode|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def tune_decode():
    """rows sweep of the fused group decode at the big-block shape
    (64 -> 512 blocks, n = 2^21): round 4 recorded 310 GB/s vs the 524
    cap; target >= 80% of cap (VERDICT r4 #6)."""
    import jax

    import bench
    from minnow_tpu.core import spec
    from minnow_tpu.ops import pallas_codec

    bits, low, high, dx = 18, 0.0, 250.0, 0.001
    n = 1 << 21
    pixels = spec.float_group_pixels(low, high, dx)
    g = pallas_codec.group_tiles(bits)
    t_g = (n // 32) // g
    db1, db2 = 64, 512

    def dec_args(b, seed):
        w = bench._dev_words((b * t_g, g * bits), seed)
        return (w, np.zeros(b, np.int64), np.full(b, low, np.float32),
                np.full(b, high, np.float32),
                np.full(b, pixels, np.int64), np.ones(b, bool))

    d1 = dec_args(db1, 51)
    d2 = dec_args(db2, 52)
    by1, by2 = db1 * n * 4, db2 * n * 4

    for rows in (0, 32, 64, 256, 512, 1024):
        def fn(w2d, mins, lowv, highv, pixv, per, _rows=rows):
            return pallas_codec.decode_float_pallas_group(
                w2d, mins, lowv, highv, pixv, per, bits, n,
                dither="none", rows=_rows)

        try:
            t0 = time.perf_counter()
            t1, t2, slopes = bench._time_pair(fn, d1, d2, by1, by2,
                                              sync=lambda o: o[:1, 0])
            med = (slopes[len(slopes) // 2] if slopes
                   else by2 / 1e9 / t2.med)
            print("decode rows=%-5s med %.1f GB/s (opt %.1f, %ds)"
                  % (rows or "dflt", med,
                     bench._safe_slope(by1, by2, t1, t2),
                     time.perf_counter() - t0), flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives a rung
            print("decode rows=%s FAILED: %s" % (rows, str(e)[:160]),
                  flush=True)


def tune_encode():
    """Big-block group-encode cap lift (see bigblock_group_try)."""
    import tools.bigblock_group_try as big

    big.main()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    t0 = time.perf_counter()
    np.asarray((jax.numpy.ones((8, 128)) + 1)[0, :1])
    print("first dispatch %.1fs" % (time.perf_counter() - t0),
          flush=True)
    if which in ("decode", "both"):
        tune_decode()
    if which in ("encode", "both"):
        tune_encode()


if __name__ == "__main__":
    main()
