"""On-chip attribution of the group encode kernel's ~49 GB/s: time the
full kernel, then the same kernel with (a) the limb quantizer stubbed to
a cast, (b) quantizer AND the planar pack stubbed.  The deltas attribute
the cost to quantize / pack / remaining structure (transposes, loops,
stats).  Outputs are numerically wrong under the stubs -- timing only.

Usage: python tools/encode_attrib.py
"""

from __future__ import annotations

import json
import time

import numpy as np

B1, B2 = 1024, 4096
N = 1 << 17
BITS = 18


def _time(fn, *args, iters=3, reps=5, sync=None):
    sync = sync or (lambda o: o[1])
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

    from minnow_tpu.core import spec
    from minnow_tpu.ops import fastdiv, pallas_codec, pallas_encode

    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    g = pallas_codec.group_tiles(BITS)
    rng = np.random.default_rng(17)

    def make(b):
        x = rng.uniform(0, 249.9, (b, N)).astype(np.float32)
        lowb = np.full(b, low, np.float32)
        pixb = np.full(b, pixels, np.int64)
        perb = np.ones(b, bool)
        dxb = np.full(b, spec.quantize_dx(low, high, pixels),
                      np.float32)
        bb, ebb, m0b, m1b, okb = fastdiv.divisor_magic(dxb)
        assert okb.all()
        return (tuple(jax.device_put(a) for a in
                      (x.reshape(-1, g * 32), lowb, bb, ebb, m0b, m1b,
                       pixb, perb)),
                b * N * 4)

    def run():
        def fn(*a):
            return pallas_encode.encode_float_pallas_group(
                *a, BITS, N)

        a1, by1 = make(B1)
        a2, by2 = make(B2)
        t1 = _time(fn, *a1)
        t2 = _time(fn, *a2)
        return ((by2 - by1) / 1e9 / (t2 - t1) if t2 > t1 else None,
                t1 * 1e3, t2 * 1e3)

    results = {"device": str(jax.devices()[0])}
    s, t1, t2 = run()
    results["full_slope_GBps"] = round(s, 2) if s else None
    results["full_t_ms"] = [round(t1, 2), round(t2, 2)]
    print(json.dumps(results), flush=True)

    # stub the quantizer: f32 -> i32 cast (keeps shapes/dtypes)
    real_q = pallas_encode._quantize_limb
    pallas_encode._quantize_limb = \
        lambda diff, b, eb, m0, m1: (diff.astype(jnp.int32),
                                     diff == diff)
    pallas_encode.encode_float_pallas_group.clear_cache()
    s, t1, t2 = run()
    out = {"noquant_slope_GBps": round(s, 2) if s else None,
           "noquant_t_ms": [round(t1, 2), round(t2, 2)]}
    print(json.dumps(out), flush=True)

    # additionally stub the planar pack: static slice of the tile
    # (keeps the (bits, cs) output shape, skips the shift/or tree)
    real_p = pallas_encode._pack_tile_planar
    pallas_encode._pack_tile_planar = \
        lambda tiles, bits: tiles[:bits, :]
    pallas_encode.encode_float_pallas_group.clear_cache()
    s, t1, t2 = run()
    out = {"noquant_nopack_slope_GBps": round(s, 2) if s else None,
           "noquant_nopack_t_ms": [round(t1, 2), round(t2, 2)]}
    print(json.dumps(out), flush=True)

    pallas_encode._quantize_limb = real_q
    pallas_encode._pack_tile_planar = real_p


if __name__ == "__main__":
    main()
