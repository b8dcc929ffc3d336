"""On-chip validation + timing of the fused Pallas encode kernel.

1. Byte-exactness vs the normative spec on the REAL backend (limb
   quantizer + recenter + stats + pack in one kernel).
2. Slope throughput at the flagship 18-bit config vs the XLA
   prepare+pack path.

Usage: python tools/pallas_encode_check.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time(fn, *args, iters=5, reps=6, sync=None):
    sync = sync or (lambda o: o[1])
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
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, codec, fastdiv, pallas_encode

    out = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(12)
    bits = 18
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)

    # -- byte-exactness on the real backend --------------------------------
    B, n = 6, 4096
    x = rng.uniform(0, 249.9, (B, n)).astype(np.float32)
    wrap = np.concatenate([rng.uniform(0, 3, n // 2),
                           250.0 - rng.uniform(0, 3, n - n // 2)])
    x[2] = wrap.astype(np.float32)  # periodic wrap cluster
    lowv = np.full(B, low, np.float32)
    pixv = np.full(B, pixels, np.int64)
    per = np.ones(B, bool)
    dxq = np.full(B, spec.quantize_dx(low, high, pixels), np.float32)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)
    assert dok.all()

    words, mins, maxd, valid = (np.asarray(a) for a in
                                pallas_encode.encode_float_pallas(
        x, lowv, db, deb, dm0, dm1, pixv, per, bits, n))
    exact = bool(valid.all())
    for i in range(B):
        payload, mn, bts, _ = spec.encode_float_block(x[i], low, high,
                                                      pixels)
        if mins[i] != mn or spec.precision_needed(int(maxd[i])) != bts:
            exact = False
            out["stats_mismatch"] = i
            break
        if bts == bits and \
                bitpack.words_to_bytes(words[i], bits, n) != payload:
            exact = False
            out["payload_mismatch"] = i
            break
    out["encode_exact"] = exact
    print(json.dumps(out), flush=True)
    if not exact:
        return

    # -- throughput --------------------------------------------------------
    # slope over BLOCK COUNT at fixed block size (the kernel holds one
    # whole block in VMEM, so n is capped; total bytes scale via B)

    def make(b, n):
        xb = rng.uniform(0, 249.9, (b, n)).astype(np.float32)
        lowb = np.full(b, low, np.float32)
        pixb = np.full(b, pixels, np.int64)
        perb = np.ones(b, bool)
        dxb = np.full(b, spec.quantize_dx(low, high, pixels),
                      np.float32)
        bb, ebb, m0b, m1b, okb = fastdiv.divisor_magic(dxb)
        lens = np.full(b, n, np.int64)
        return (tuple(jax.device_put(a) for a in
                      (xb, lowb, bb, ebb, m0b, m1b, pixb, perb, lens)),
                b * n * 4)

    def run(b, n):
        def pallas_fn(xb, lowb, bb, ebb, m0b, m1b, pixb, perb, lens):
            return pallas_encode.encode_float_pallas(
                xb, lowb, bb, ebb, m0b, m1b, pixb, perb, bits, n)

        @jax.jit
        def xla_fn(xb, lowb, bb, ebb, m0b, m1b, pixb, perb, lens):
            deltas, mins, maxd, vld = codec.prepare_float_blocks_fast32(
                xb, lowb, pixb, lens, perb, bb, ebb, m0b, m1b)
            return bitpack.pack_batch(deltas, bits), mins

        args, nbytes = make(b, n)
        tp = _time(pallas_fn, *args)
        tx = _time(xla_fn, *args)
        return tp, tx, nbytes

    n_blk = 1 << 17
    tp1, tx1, by1 = run(8, n_blk)
    tp2, tx2, by2 = run(128, n_blk)
    out2 = {
        "pallas_slope_GBps": round((by2 - by1) / 1e9 / (tp2 - tp1), 3)
        if tp2 > tp1 else None,
        "xla_slope_GBps": round((by2 - by1) / 1e9 / (tx2 - tx1), 3)
        if tx2 > tx1 else None,
        "pallas_large_GBps": round(by2 / 1e9 / tp2, 3),
        "xla_large_GBps": round(by2 / 1e9 / tx2, 3),
    }
    print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    main()
