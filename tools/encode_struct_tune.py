"""On-chip tuning of the group encode kernel's structural overheads.

tools/encode_attrib.py put 28% of kernel time in "structure"; at the
bench shape (4096 blocks of 2^17, 18-bit, t_g=64) the kpb=2 merge cap
still leaves 2048 grid instances ~ 9 ms of pure per-instance overhead
(~4-5 us each, the decode twin's measurement).  Variants:

* cap128  -- production baseline (kpb_cap=128 -> kpb=2 at t_g=64)
* cap256  -- kpb=4: half the instances, ~7.7 MB double-buffered VMEM
* cap512  -- kpb=8: quarter the instances, ~14 MB (may OOM scoped VMEM)
* +psem   -- dimension_semantics=("parallel",) like the decode kernel

Each cap variant is first byte-validated against the normative spec at
a small merged shape, then timed 1024 -> 4096 blocks (537 MB -> 2.1 GB
input: the large point sits well clear of the ~25 ms dispatch floor).

Usage: python tools/encode_struct_tune.py [variant ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

VARIANTS = {
    "cap128": dict(kpb_cap=128, psem=False),
    "cap256": dict(kpb_cap=256, psem=False),
    "cap512": dict(kpb_cap=512, psem=False),
    "cap128p": dict(kpb_cap=128, psem=True),
    "cap256p": dict(kpb_cap=256, psem=True),
    "cap512p": dict(kpb_cap=512, psem=True),
    # column-constant specialization (round-4): scalars compiled in
    "const128": dict(kpb_cap=128, psem=False, const=True),
    "const256": dict(kpb_cap=256, psem=False, const=True),
    "const128p": dict(kpb_cap=128, psem=True, const=True),
}


def _time(fn, *args, iters=5, reps=6):
    np.asarray(fn(*args)[1])
    np.asarray(fn(*args)[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(*args)[1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(names):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, fastdiv, pallas_codec, \
        pallas_encode

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    bits = 18
    G = pallas_codec.group_tiles(bits)
    ge = G * 32
    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    dxq = spec.quantize_dx(low, high, pixels)

    def scalars(b):
        lowv = np.full(b, low, np.float32)
        pixv = np.full(b, pixels, np.int64)
        per = np.ones(b, bool)
        db, deb, dm0, dm1, dok = fastdiv.divisor_magic(
            np.full(b, dxq, np.float32))
        assert dok.all()
        return lowv, db, deb, dm0, dm1, pixv, per

    def const_cfg():
        _, db, deb, dm0, dm1, _, _ = scalars(1)
        return pallas_encode.make_const_cfg(low, db, deb, dm0, dm1,
                                            pixels, True)

    def resolve(kw):
        kw = dict(kw)
        if kw.pop("const", False):
            kw["const_cfg"] = const_cfg()
        return kw

    rng = np.random.default_rng(12)

    def validate(kw):
        B, n = 6, 32 * G * 8
        x = rng.uniform(0, 249.9, (B, n)).astype(np.float32)
        wrap = np.concatenate([rng.uniform(0, 3, n // 2),
                               250.0 - rng.uniform(0, 3, n - n // 2)])
        x[2] = wrap.astype(np.float32)
        x[4] = rng.uniform(0, 2.0, n).astype(np.float32)
        lowv, db, deb, dm0, dm1, pixv, per = scalars(B)
        words, mins, maxd, valid = (
            np.asarray(a) for a in pallas_encode.encode_float_pallas_group(
                x.reshape(-1, ge), lowv, db, deb, dm0, dm1, pixv, per,
                bits, n, **kw))
        words = words.reshape(B, (n // 32) * bits)
        for i in range(B):
            payload, mn, bts, _ = spec.encode_float_block(
                x[i], low, high, pixels)
            if mins[i] != mn or spec.precision_needed(int(maxd[i])) != bts:
                return False
            if bts == bits and \
                    bitpack.words_to_bytes(words[i], bits, n) != payload:
                return False
        return bool(valid.all())

    n_blk = 1 << 17

    def run(b, kw):
        xb = rng.uniform(0, 249.9, (b, n_blk)).astype(np.float32)
        args = tuple(jax.device_put(a)
                     for a in (xb.reshape(-1, ge),) + scalars(b))

        def fn(*a):
            return pallas_encode.encode_float_pallas_group(
                *a, bits, n_blk, **kw)
        t = _time(fn, *args)
        return t, b * n_blk * 4

    for name in names:
        kw = resolve(VARIANTS[name])
        res = {"variant": name}
        try:
            # psem cannot change bytes; caps and const can
            if not kw["psem"] or "const_cfg" in kw:
                res["exact"] = validate(kw)
                if not res["exact"]:
                    print(json.dumps(res), flush=True)
                    continue
            t1, by1 = run(1024, kw)
            t2, by2 = run(4096, kw)
            res.update({
                "slope_GBps": round((by2 - by1) / 1e9 / (t2 - t1), 2)
                if t2 > t1 else None,
                "large_GBps": round(by2 / 1e9 / t2, 2),
                "t_1024_ms": round(t1 * 1e3, 2),
                "t_4096_ms": round(t2 * 1e3, 2)})
        except Exception as e:  # noqa: BLE001 - survey all variants
            res["error"] = repr(e)[:300]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(VARIANTS))
