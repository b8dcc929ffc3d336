"""Extended fuzz soak of the round-3/4 kernels (int pack, fused
uniform decode, const-specialized encode) -- many random
width/shape/config draws beyond the suite's seeds.

  python tools/r3_kernel_fuzz_soak.py [n_seeds]       # interpret mode
  python tools/r3_kernel_fuzz_soak.py --device [reps] # on-chip sweep

``--device`` runs a deterministic EVERY-WIDTH sweep on the real
backend instead (int pack 1-64, uniform decode + const encode 2-24),
random data per rep, fixed shapes per width so remote compiles
amortize across reps.  Silicon-only Mosaic miscompiles are
width/op-pattern specific (observed on v5e), so sweeping every width
class on chip is the coverage interpret mode cannot give.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

INTERPRET = True  # --device flips to the real backend


def one_int_pack(rng, bits=None):
    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, pallas_encode
    from minnow_tpu.ops.pallas_codec import group_tiles

    fixed = bits is not None
    if not fixed:
        bits = int(rng.integers(1, 65))
    g = group_tiles(bits)
    align = 32 * g * 8
    if fixed:
        # device sweep: one shape per width so the (remote) compile
        # amortizes across reps; keep n ragged vs n_pad.
        n_pad = align
        n = max(1, n_pad - 5)
        bsz = 2
    else:
        n_pad = align * int(rng.integers(1, 3))
        n = int(rng.integers(max(1, n_pad - align + 1), n_pad + 1))
        bsz = int(rng.integers(1, 4))
    hi_excl = (1 << bits) - 1 if bits == 64 else (1 << bits)
    vals = rng.integers(0, hi_excl, (bsz, n), dtype=np.uint64)
    mins = rng.integers(-(2 ** 50), 2 ** 50, bsz).astype(np.int64)
    x = vals.view(np.int64) + mins[:, None]
    lens = rng.integers(0, n + 1, bsz).astype(np.int64)
    words = np.asarray(pallas_encode.delta_pack_int_pallas(
        x, mins, lens, bits, n, n_pad, interpret=INTERPRET))
    for i in range(bsz):
        d = np.zeros(n, np.uint64)
        d[:lens[i]] = (x[i, :lens[i]] - mins[i]).view(np.uint64)
        ref = spec.pack_bits(d, bits)
        got = bitpack.words_to_bytes(words[i], bits, n)
        assert got == ref, ("int_pack", bits, n, n_pad, i)


def one_uniform(rng, bits=None):
    from minnow_tpu.core import spec
    from minnow_tpu.ops import bitpack, codec, pallas_codec

    fixed = bits is not None
    if not fixed:
        bits = int(rng.integers(2, 25))
    g = pallas_codec.group_tiles(bits)
    t_g = 16 if fixed else int(rng.choice([8, 16, 24, 64, 128, 136]))
    n = 32 * g * t_g
    bsz = 2 if fixed else int(rng.integers(1, 4))
    pixels = min((1 << bits) - 1, (1 << 24) - 1)
    vals = rng.integers(0, pixels, (bsz, n), dtype=np.uint64)
    words = np.stack([
        bitpack.bytes_to_words(spec.pack_bits(v, bits), bits, n)
        for v in vals])
    mins = rng.integers(-3, 4, bsz).astype(np.int64)
    low = rng.uniform(-1000, 1000, bsz).astype(np.float32)
    high = (low + rng.uniform(0.5, 5000, bsz)).astype(np.float32)
    pix = np.full(bsz, pixels, np.int64)
    per = rng.integers(0, 2, bsz).astype(bool)
    ids = rng.integers(0, 1 << 50, bsz).astype(np.int64)
    sd = int(rng.integers(0, 1000))
    ref = np.asarray(codec.decode_float_blocks32(
        words, mins, low, high, pix, per, ids, bits, n,
        dither="uniform", seed=sd))
    k1, k2 = (np.asarray(k) for k in codec.dither_keys(ids, sd))
    got = np.asarray(pallas_codec.decode_float_pallas_group(
        words.reshape(-1, g * bits), mins, low, high, pix, per,
        bits, n, dither="uniform", interpret=INTERPRET,
        key1=k1, key2=k2)).reshape(bsz, n)
    assert np.array_equal(ref.view(np.uint32), got.view(np.uint32)), \
        ("uniform", bits, t_g, bsz, sd)


def one_const_encode(rng, bits=None):
    """Const-specialized group encode == generic kernel, random width /
    pixels / periodic / data class (round-4)."""
    from minnow_tpu.core import spec
    from minnow_tpu.ops import fastdiv, pallas_codec, pallas_encode

    fixed = bits is not None
    if not fixed:
        bits = int(rng.integers(2, 25))
    g = pallas_codec.group_tiles(bits)
    t_g = 16 if fixed else int(rng.choice([8, 16, 64]))
    n = 32 * g * t_g
    bsz = 2 if fixed else int(rng.integers(1, 4))
    if fixed:
        # device sweep: pin the quantization scalars per width so the
        # const_cfg program (constants are baked in) compiles once and
        # amortizes across reps; data stays random per rep.
        pixels = min((1 << bits) - 1, (1 << 24) - 1)
        low, high = 0.0, 1000.0
        periodic = bool(bits % 2)
    else:
        pixels = int(rng.integers(3, min((1 << bits), 1 << 24)))
        low = float(rng.uniform(-1000, 1000))
        high = low + float(rng.uniform(0.5, 5000))
        periodic = bool(rng.integers(0, 2))
    dxv = spec.quantize_dx(low, high, pixels)
    span = np.float32(high) - np.float32(low)
    x = (low + rng.uniform(0, 1, (bsz, n)).astype(np.float32)
         * (span * np.float32(0.999))).astype(np.float32)
    if rng.integers(0, 2):
        x[0, int(rng.integers(0, n))] = high + 1.0  # invalid class
    lowv = np.full(bsz, low, np.float32)
    pixv = np.full(bsz, pixels, np.int64)
    perv = np.full(bsz, periodic, bool)
    db, deb, dm0, dm1, dok = fastdiv.divisor_magic(
        np.full(bsz, dxv, np.float32))
    if not dok.all():
        return  # divisor class the fast path rejects anyway
    base = tuple(np.asarray(a) for a in
                 pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=INTERPRET))
    cfg = pallas_encode.make_const_cfg(low, db, deb, dm0, dm1, pixels,
                                       periodic)
    const = tuple(np.asarray(a) for a in
                  pallas_encode.encode_float_pallas_group(
        x.reshape(-1, g * 32), lowv, db, deb, dm0, dm1, pixv, perv,
        bits, n, interpret=INTERPRET, const_cfg=cfg))
    for a, c, name in zip(base, const, ("words", "mins", "maxd",
                                        "valid")):
        assert np.array_equal(a, c), \
            ("const_encode", bits, t_g, pixels, periodic, name)


def device_sweep(reps):
    """Every-width on-chip sweep: int pack 1-64, fused uniform decode +
    const encode 2-24.  Fixed shapes/configs per width (compiles
    amortize across reps); random data per rep."""
    global INTERPRET
    INTERPRET = False
    from minnow_tpu.utils.backend_guard import ensure_compile_cache

    ensure_compile_cache()
    import jax

    print("backend: %s, %d device(s)" % (
        jax.default_backend(), jax.device_count()), flush=True)
    t0 = time.time()
    for bits in range(1, 65):
        for rep in range(reps):
            rng = np.random.default_rng(9173 + 1000 * bits + rep)
            one_int_pack(rng, bits=bits)
        print("int_pack bits=%d ok x%d (%.0fs)" % (
            bits, reps, time.time() - t0), flush=True)
    for bits in range(2, 25):
        for rep in range(reps):
            rng = np.random.default_rng(7411 + 1000 * bits + rep)
            one_uniform(rng, bits=bits)
            one_const_encode(rng, bits=bits)
        print("uniform+const bits=%d ok x%d (%.0fs)" % (
            bits, reps, time.time() - t0), flush=True)
    print("DEVICE SWEEP OK: %d widths int, %d widths float, %d reps,"
          " %.0fs" % (64, 23, reps, time.time() - t0))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--device":
        device_sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
        return
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    t0 = time.time()
    for seed in range(n_seeds):
        rng = np.random.default_rng(31337 + seed)
        one_int_pack(rng)
        one_uniform(rng)
        one_const_encode(rng)
        if (seed + 1) % 10 == 0:
            print("seed %d/%d ok (%.0fs)" % (seed + 1, n_seeds,
                                             time.time() - t0),
                  flush=True)
            # every random config jit-compiles a fresh program; the
            # in-process cache grows without bound and LLVM's JIT
            # eventually fails with "Cannot allocate memory" (observed
            # at ~50 random configs).  Dropping the caches keeps the
            # soak bounded; recompiles are the cost.
            import jax

            jax.clear_caches()
    print("SOAK OK: %d seeds, %.0fs" % (n_seeds, time.time() - t0))


if __name__ == "__main__":
    main()
