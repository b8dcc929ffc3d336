"""Round-3 kernel tuning batch (run on the real chip after
tools/run_chip_recheck.sh): slope-measures the NEW kernels' knobs so
one chip session settles them.

  python tools/r3_kernel_tune.py

Measures (block-count spread, sync-every-iteration -- the trustworthy
harness, see docs/STATUS.md measurement warning):
  * int pack kernel (width 41) at rows in {auto, 8, 16, 32}
    vs the XLA delta_pack_batch second dispatch
  * fused uniform decode at rows {auto} vs the composite and XLA paths
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# one timing harness: bench.py's _time (per-rep distribution, tunnel
# spike rejection) + _safe_slope (noise guard when t2 <= t1)
from bench import _safe_slope, _time  # noqa: E402


def _slope(fn, make_args, b1, b2, sync):
    a1, by1 = make_args(b1)
    a2, by2 = make_args(b2)
    t1 = _time(fn, *a1, sync=sync)
    t2 = _time(fn, *a2, sync=sync)
    return _safe_slope(by1, by2, t1, t2)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1.0)
    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, codec, pallas_codec, \
        pallas_encode

    out = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    # --- int pack kernel (ID-column width 41), rows sweep ------------
    bits = 41
    n = 1 << 18

    def id_args(b):
        x = rng.integers(0, 10 ** 12, (b, n), dtype=np.int64)
        lens = np.full(b, n, np.int64)
        return (jax.device_put(x), jax.device_put(lens)), x.nbytes

    for rows in (0, 8, 16, 32):
        @jax.jit
        def enc(x, lens, _rows=rows):
            mins, maxd = codec.int_block_stats(x, lens)
            mins = jax.lax.optimization_barrier(mins)
            from minnow_tpu.ops.pallas_codec import group_tiles

            g = group_tiles(bits)
            mask = jax.lax.broadcasted_iota(
                np.int64, (1, n), 1) < lens[:, None]
            import jax.numpy as jnp

            d = jnp.where(mask, x - mins[:, None], 0)
            t_g = (n // 32) // g
            dlo, dhi = bitpack.split_u64(d.astype(jnp.uint64))
            w = pallas_encode.pack_int_pallas_group(
                dlo.reshape(x.shape[0] * t_g, g * 32),
                dhi.reshape(x.shape[0] * t_g, g * 32), bits, n,
                rows=_rows)
            return w, mins

        try:
            out["int41_pack_rows%s_GBps" % (rows or "auto")] = round(
                _slope(enc, id_args, 64, 1024,
                       sync=lambda o: o[1][:1]), 2)
        except Exception as e:  # noqa: BLE001
            out["int41_pack_rows%s_error" % (rows or "auto")] = \
                str(e)[:160]

    # XLA second dispatch for comparison
    @jax.jit
    def enc_xla(x, lens):
        mins, maxd = codec.int_block_stats(x, lens)
        mins = jax.lax.optimization_barrier(mins)
        return bitpack.delta_pack_batch(x, mins, lens, bits), mins

    out["int41_pack_xla_GBps"] = round(
        _slope(enc_xla, id_args, 64, 1024, sync=lambda o: o[1][:1]), 2)

    # --- fused uniform decode vs composite vs XLA --------------------
    fbits, low, high, dx = 18, 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    fn = 1 << 17
    g = pallas_codec.group_tiles(fbits)

    def dec_args(b):
        t_g = (fn // 32) // g
        w = rng.integers(0, 1 << 32, (b * t_g, g * fbits),
                         dtype=np.uint64).astype(np.uint32)
        ids = np.arange(b, dtype=np.int64)
        k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, 0))
        return ((jax.device_put(w), np.zeros(b, np.int64),
                 np.full(b, low, np.float32),
                 np.full(b, high, np.float32),
                 np.full(b, pixels, np.int64), np.ones(b, bool),
                 ids, k1, k2), b * fn * 4)

    def dec_fused(w2d, mins, lo, hi, pix, per, ids, k1, k2):
        return pallas_codec.decode_float_pallas_group(
            w2d, mins, lo, hi, pix, per, fbits, fn, dither="uniform",
            key1=k1, key2=k2)

    def dec_comp(w2d, mins, lo, hi, pix, per, ids, k1, k2):
        return codec.decode_float_blocks32_group(
            w2d, mins, lo, hi, pix, per, ids, fbits, fn, fn)

    def dec_none(w2d, mins, lo, hi, pix, per, ids, k1, k2):
        return pallas_codec.decode_float_pallas_group(
            w2d, mins, lo, hi, pix, per, fbits, fn, dither="none")

    for name, fndec in (("fused", dec_fused), ("composite", dec_comp),
                        ("none", dec_none)):
        try:
            out["dec_uniform_%s_GBps" % name] = round(
                _slope(fndec, dec_args, 256, 4096,
                       sync=lambda o: o[:1, 0]), 2)
        except Exception as e:  # noqa: BLE001
            out["dec_uniform_%s_error" % name] = str(e)[:160]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
