"""Round-5 encode experiment: run the fused group-encode kernel on
BIG blocks (n = 2^21, t_g = 1024) by lifting the t_g <= 256 cap, and
compare speed + bytes against the production two-dispatch big-block
path (XLA stats + stateless pack kernel, ~34 GB/s in round 4).

The cap exists to bound the whole-block q scratch (t_g, G*32) i32 at
2 MB; at t_g = 1024 the scratch is 8 MB and the x block another 8 MB.
If Mosaic's scoped-VMEM budget takes it, the fused kernel's one-pass
structure (one HBM read, stats from VMEM) should hold its ~52 GB/s on
the big-block shape, vs ~34 for two dispatches that read x twice.

Usage (real chip): python tools/bigblock_group_try.py
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


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import bench
    from minnow_tpu.core import spec
    from minnow_tpu.ops import fastdiv, pallas_codec, pallas_encode

    bits, low, high, dx = 18, 0.0, 250.0, 0.001
    n = 1 << 21
    pixels = spec.float_group_pixels(low, high, dx)
    g = pallas_codec.group_tiles(bits)
    t_g = (n // 32) // g
    print("n=%d t_g=%d (cap today: 256)" % (n, t_g), flush=True)

    def make(b, seed):
        x2d = bench._dev_uniform(b * t_g, g * 32, seed)
        lowv = np.full(b, low, np.float32)
        pixv = np.full(b, pixels, np.int64)
        per = np.ones(b, bool)
        dxq = np.full(b, spec.quantize_dx(low, high, pixels),
                      np.float32)
        db, deb, dm0, dm1, ok = fastdiv.divisor_magic(dxq)
        assert ok.all()
        return (x2d, jax.device_put(lowv.astype(np.float32)),
                jax.device_put(db), jax.device_put(deb),
                jax.device_put(dm0), jax.device_put(dm1),
                jax.device_put(pixv), jax.device_put(per)), b * n * 4

    def enc_group(x2d, lowv, db, deb, dm0, dm1, pixv, per):
        return pallas_encode.encode_float_pallas_group(
            x2d, lowv, db, deb, dm0, dm1, pixv, per, bits, n)

    def enc_twodispatch(x2d, lowv, db, deb, dm0, dm1, pixv, per):
        return pallas_encode.encode_float_pallas_bigblock(
            x2d, lowv, db, deb, dm0, dm1, pixv, per, bits, n)

    b1, b2 = 16, 128
    a1, by1 = make(b1, 1)
    a2, by2 = make(b2, 2)

    # byte equality between the two paths, on-device
    wg, mg, _, vg = enc_group(*a1)
    wb, mb, _, vb = enc_twodispatch(*a1)
    eq = jax.jit(lambda p, q: jnp.all(p == q))
    assert np.asarray(vg).all() and np.asarray(vb).all()
    assert bool(eq(wg, wb.reshape(wg.shape))), "words diverged!"
    assert np.array_equal(np.asarray(mg), np.asarray(mb))
    print("bytes MATCH between group kernel and two-dispatch",
          flush=True)

    for label, fn in (("group_kernel", enc_group),
                      ("two_dispatch", enc_twodispatch)):
        t0 = time.perf_counter()
        t1, t2, slopes = bench._time_pair(fn, a1, a2, by1, by2,
                                          sync=lambda o: o[1])
        med = slopes[len(slopes) // 2] if slopes else by2 / 1e9 / t2.med
        print("%s: med-paired %.1f GB/s  (min-slope %.1f, t1=%.4f "
              "t2=%.4f, %.0fs)" % (
                  label, med, bench._safe_slope(by1, by2, t1, t2),
                  float(t1), float(t2), time.perf_counter() - t0),
              flush=True)


if __name__ == "__main__":
    main()
