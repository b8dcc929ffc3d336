"""On-chip attribution of the int64 (ID-column) encode path: is the
XLA int64 prepare (min/delta) or the limb pack the bottleneck?
Usage: python tools/int_encode_attrib.py"""
import json, time
import numpy as np

def _time(fn, *args, sync, iters=4, reps=5):
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
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from minnow_tpu.ops import bitpack, codec
    rng = np.random.default_rng(3)
    out = {"device": str(jax.devices()[0])}
    n = 1 << 18

    prep = jax.jit(codec.prepare_int_blocks)
    pack41 = jax.jit(lambda d: bitpack.pack_batch(d, 41))
    @jax.jit
    def full(x, lens):
        deltas, mins, maxd = codec.prepare_int_blocks(x, lens)
        deltas = jax.lax.optimization_barrier(deltas)
        return bitpack.pack_batch(deltas, 41), mins

    def args(b):
        x = rng.integers(0, 10**12, (b, n), dtype=np.int64)
        lens = np.full(b, n, np.int64)
        return jax.device_put(x), jax.device_put(lens)

    res = {}
    for b in (64, 512):
        import sys
        print("put b=%d" % b, flush=True)
        x, lens = args(b)
        print("prep-compile", flush=True)
        d = prep(x, lens)[0]
        np.asarray(d[0, :1])
        print("warm done", flush=True)
        res[b] = {
            "prepare_ms": _time(prep, x, lens, sync=lambda o: o[1]) * 1e3,
            "pack_ms": _time(pack41, d, sync=lambda o: o[0, :1]) * 1e3,
            "full_ms": _time(full, x, lens, sync=lambda o: o[1]) * 1e3,
            "bytes": b * n * 8,
        }
        del x, lens, d
    for k in ("prepare_ms", "pack_ms", "full_ms"):
        dt = (res[512][k] - res[64][k]) / 1e3
        out[k.replace("_ms", "_slope_GBps")] = round(
            (res[512]["bytes"] - res[64]["bytes"]) / 1e9 / dt, 2) \
            if dt > 0 else None
    out["detail_ms"] = {str(b): {k: round(v, 2) for k, v in r.items()}
                       for b, r in res.items()}
    print(json.dumps(out))

main()
