"""Pin the vs_baseline denominator: reference-algorithm C++ probe.

Builds tools/ref_algo_baseline.cpp (a disclosed C++ transliteration of
the reference Go bit kernel's loop structure, ref go/bit/bit.go:41-81,
100-131) with the SAME compiler/flags as native/fastbits.cpp, and times
both single-core on the same buffers -- answering VERDICT r3 next #7:
is the repo's C++ single-core stand-in a fair (conservative) proxy for
the reference-class kernel on this host?

Output: one JSON line with GB/s (of uncompressed uint64 input, matching
the reference harness's b.SetBytes(8*len) convention,
ref go/bit/bit_test.go:71-112) for both kernels across the reference
harness's width sweep.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(HERE, "ref_algo_baseline.cpp")
SO = os.path.join(HERE, "build", "ref_algo_baseline.so")


def build():
    os.makedirs(os.path.dirname(SO), exist_ok=True)
    if (os.path.exists(SO)
            and os.path.getmtime(SO) >= os.path.getmtime(SRC)):
        return
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-Wall",
         SRC, "-shared", "-o", SO], check=True)


def bench(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import sys
    sys.path.insert(0, REPO)
    from minnow_tpu import native
    from minnow_tpu.core import spec

    build()
    ref = ctypes.CDLL(SO)
    ref.ref_style_pack.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int, ctypes.c_void_p]
    ref.ref_style_unpack.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int, ctypes.c_void_p]
    assert native.available()
    lib = native._load()

    rng = np.random.default_rng(2)
    n = 1 << 22
    widths = [8, 11, 16, 23, 32, 45, 64]  # ref bit_test.go:71-112 sweep
    out = {"n": n, "widths": {}}
    for bits in widths:
        hi = (1 << 63) if bits >= 63 else (1 << bits)
        x = rng.integers(0, hi, n, dtype=np.uint64)
        nbytes = spec.array_bytes(bits, n)
        buf_ref = np.zeros(nbytes + 16, np.uint8)
        buf_fast = np.zeros(nbytes + 16, np.uint8)
        u_ref = np.empty(n, np.uint64)
        u_fast = np.empty(n, np.uint64)

        def pack_ref():
            buf_ref[:] = 0
            ref.ref_style_pack(x.ctypes.data, n, bits,
                               buf_ref.ctypes.data)

        def pack_fast():
            buf_fast[:] = 0
            lib.mnw_pack(x.ctypes.data, n, bits, buf_fast.ctypes.data,
                         1)

        t_pr = bench(pack_ref)
        t_pf = bench(pack_fast)
        assert bytes(buf_ref[:nbytes]) == bytes(buf_fast[:nbytes]), \
            "kernels disagree at bits=%d" % bits

        def unpack_ref():
            ref.ref_style_unpack(buf_ref.ctypes.data, n, bits,
                                 u_ref.ctypes.data)

        def unpack_fast():
            lib.mnw_unpack(buf_fast.ctypes.data, n, bits,
                           u_fast.ctypes.data, 1)

        t_ur = bench(unpack_ref)
        t_uf = bench(unpack_fast)
        assert np.array_equal(u_ref, u_fast)
        gb = x.nbytes / 1e9
        out["widths"][bits] = {
            "pack_ref_style_GBps": round(gb / t_pr, 3),
            "pack_fastbits_GBps": round(gb / t_pf, 3),
            "unpack_ref_style_GBps": round(gb / t_ur, 3),
            "unpack_fastbits_GBps": round(gb / t_uf, 3),
        }
    ratios = [w["pack_fastbits_GBps"] / w["pack_ref_style_GBps"]
              for w in out["widths"].values()]
    out["pack_fastbits_over_ref_style_min"] = round(min(ratios), 3)
    out["pack_fastbits_over_ref_style_max"] = round(max(ratios), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
