"""On-chip validation + timing of the fused Pallas decode kernel.

1. Byte-exactness: unpack_pallas vs the normative host spec, and the
   fused float decode vs codec.decode_float_blocks32, on the REAL
   backend (Mosaic lowering can differ from interpret mode -- round-1
   findings in ops/pallas_pack.py).
2. Slope throughput at the flagship 18-bit config, compared to the XLA
   decode path.

Usage: python tools/pallas_decode_check.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time(fn, *args, iters=5, reps=6, sync=None):
    sync = sync or (lambda o: o[0, :1])
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
    from minnow_tpu.ops import bitpack, codec, pallas_codec

    out = {"device": str(jax.devices()[0])}

    # -- byte-exactness on the real backend --------------------------------
    rng = np.random.default_rng(3)
    bits, n_val, b_val = 18, 4096, 4
    pixels = 250000
    vals = rng.integers(0, pixels, (b_val, n_val), dtype=np.uint64)
    words = np.stack([
        np.frombuffer(
            spec.pack_bits(v, bits)
            + b"\0" * (bitpack.words_per_block(bits, n_val) * 4
                       - spec.array_bytes(bits, n_val)), dtype="<u4")
        for v in vals])
    got = np.asarray(pallas_codec.unpack_pallas(
        jax.device_put(words), bits, n_val))
    out["unpack_exact"] = bool((got.astype(np.uint64) == vals).all())

    mins = rng.integers(-3, 3, b_val).astype(np.int64)
    low = np.full(b_val, 0.0, np.float32)
    high = np.full(b_val, 250.0, np.float32)
    pix = np.full(b_val, pixels, np.int64)
    periodic = np.ones(b_val, bool)
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, periodic, np.arange(b_val), bits,
        n_val, dither="none"))
    mine = np.asarray(pallas_codec.decode_float_pallas(
        words, mins, low, high, pix, periodic, bits, n_val,
        dither="none"))
    out["decode_exact"] = bool(
        (ref.view(np.uint32) == mine.view(np.uint32)).all())
    if not out["decode_exact"]:
        bad = np.nonzero(ref.view(np.uint32) != mine.view(np.uint32))
        out["first_mismatch"] = [int(bad[0][0]), int(bad[1][0]),
                                 float(ref[bad][0]), float(mine[bad][0])]
    print(json.dumps(out), flush=True)
    if not (out["unpack_exact"] and out["decode_exact"]):
        return

    # -- throughput --------------------------------------------------------
    import jax.numpy as jnp

    b = 64

    def make(n):
        t = n // 32
        w = rng.integers(0, 1 << 32, (b, t * bits),
                         dtype=np.uint64).astype(np.uint32)
        consts = (np.zeros(b, np.int64), np.full(b, 0.0, np.float32),
                  np.full(b, 250.0, np.float32),
                  np.full(b, pixels, np.int64), np.ones(b, bool))
        return ((jax.device_put(w),)
                + tuple(jax.device_put(c) for c in consts)), b * n * 4

    def run(n):
        def pallas_fn(w, mn, lo, hi, px, per):
            return pallas_codec.decode_float_pallas(
                w, mn, lo, hi, px, per, bits, n, dither="none")

        def xla_fn(w, mn, lo, hi, px, per):
            return codec.decode_float_blocks32(
                w, mn, lo, hi, px, per, jnp.arange(b), bits, n,
                dither="none")

        args, nbytes = make(n)
        tp = _time(pallas_fn, *args)
        tx = _time(xla_fn, *args)
        return tp, tx, nbytes

    tp1, tx1, by1 = run(1 << 17)
    tp2, tx2, by2 = run(1 << 21)
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
