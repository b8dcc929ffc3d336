"""Native C++ engine vs the normative spec, byte-for-byte.

The host container codec (core/groups.py) routes packing through the
native kernel when available, so this equivalence is load-bearing for
every host-written file (the golden digests also pin it end-to-end).
"""

import numpy as np
import pytest

from minnow_tpu import native
from minnow_tpu.core import spec


def test_native_builds():
    assert native.available(), \
        "native engine failed to build (g++ is baked into the image)"


@pytest.mark.parametrize("bits", list(range(0, 65)))
def test_native_pack_matches_spec(bits):
    rng = np.random.default_rng(bits + 7)
    x = rng.integers(0, 2**63, 777, dtype=np.int64).view(np.uint64)
    x = (x << np.uint64(1)) | rng.integers(0, 2, 777).astype(np.uint64)
    want = spec.pack_bits(x, bits)
    assert native.pack_bits(x, bits) == want
    back = native.unpack_bits(want, bits, 777)
    np.testing.assert_array_equal(back, spec.unpack_bits(want, bits, 777))


def test_native_pack_threaded_matches():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**50, 300_000, dtype=np.int64).view(np.uint64)
    for bits in (11, 18, 45):
        want = spec.pack_bits(x, bits)
        assert native.pack_bits(x, bits, threads=4) == want
        back = native.unpack_bits(want, bits, len(x), threads=4)
        np.testing.assert_array_equal(
            back, spec.unpack_bits(want, bits, len(x)))


def test_native_periodic_min_matches_greedy():
    rng = np.random.default_rng(2)
    for pixels in (7, 100, 10**6):
        for _ in range(100):
            n = int(rng.integers(1, 64))
            x = rng.integers(0, pixels, n)
            assert native.periodic_min(x, pixels) == \
                spec.periodic_min(x, pixels)
    # out-of-range inputs follow the literal greedy scan
    x = np.array([5, 100, -3, 99])
    assert native.periodic_min(x, 100) == spec.periodic_min(x, 100)


def test_groups_use_native_and_stay_byte_identical(tmp_path):
    """Writer output with the native packer == pure-spec bytes (the
    golden digests in test_goldens.py provide the absolute pin; this is
    the direct A/B)."""
    import minnow_tpu as minnow
    from minnow_tpu.core import groups

    rng = np.random.default_rng(3)
    x = rng.integers(-(2**42), 2**42, 5000, dtype=np.int64)
    f1 = str(tmp_path / "native.minnow")
    w = minnow.create(f1)
    w.int_group(len(x))
    w.data(x)
    w.close()

    payload, mn, bits = spec.encode_int_block(x)  # pure numpy
    f2 = str(tmp_path / "spec.minnow")
    w2 = minnow.create(f2)
    w2.int_group(len(x))
    w2.data_encoded(payload, mn, bits)
    w2.close()

    assert open(f1, "rb").read() == open(f2, "rb").read()
    r = minnow.open(f1)
    np.testing.assert_array_equal(r.data(0), x)
    r.close()


def test_native_encode_float_block_matches_spec():
    """The all-native float encode (quantize -> periodic recenter ->
    delta stats -> pack) is byte-identical to spec.encode_float_block,
    including wrap clusters, out-of-range pixels and the clamp_q guard."""
    rng = np.random.default_rng(11)
    cases = []
    n = 3000
    cases.append((rng.uniform(0, 100, n).astype(np.float32),
                  0.0, 100.0, 0.05, True, False))
    wrap = np.concatenate([rng.uniform(0, 2, n // 2),
                           rng.uniform(98, 100, n - n // 2)])
    cases.append((wrap.astype(np.float32), 0.0, 100.0, 0.01, True, False))
    # out-of-range values (quantize below 0 / above pixels)
    oor = rng.uniform(-5, 110, n).astype(np.float32)
    cases.append((oor, 0.0, 100.0, 0.1, True, False))
    cases.append((rng.uniform(-50, 75, n).astype(np.float32),
                  -50.0, 75.0, 0.1, False, True))
    for x, low, high, dx, periodic, clamp in cases:
        pixels = spec.float_group_pixels(low, high, dx)
        want = spec.encode_float_block(x, low, high, pixels,
                                       periodic=periodic, clamp_q=clamp)
        got = native.encode_float_block(x, low, high, pixels,
                                        periodic=periodic, clamp_q=clamp)
        assert got[0] == want[0]
        assert got[1] == want[1] and got[2] == want[2]
        np.testing.assert_array_equal(got[3], want[3])


def test_parse_columns_bit_equals_python_float():
    """The native field parser (Clinger fast path + strtod fallback,
    native/fastbits.cpp fast_field_to_double) is bit-identical to
    CPython's correctly rounded float() across format-typical and
    adversarial decimal strings (halfway cases, subnormals, huge/tiny
    exponents, >19-digit significands that must take the slow path)."""
    rng = np.random.default_rng(0)
    vals = []
    vals += ["%.5f" % v for v in rng.uniform(-1e3, 1e3, 1000)]
    signs = np.where(rng.integers(0, 2, 1000), 1, -1)
    vals += ["%.6e" % v
             for v in 10.0 ** rng.uniform(-300, 300, 1000) * signs]
    vals += ["%d" % v for v in rng.integers(-10**18, 10**18, 1000)]
    raw = np.frombuffer(
        rng.integers(0, 2**64, 400, dtype=np.uint64).tobytes(),
        dtype=np.float64)
    vals += ["%.17g" % v for v in raw if np.isfinite(v)]
    vals += ["5e-324", "2.4703282292062327e-324",
             "1.7976931348623157e308", "9007199254740993",
             "9007199254740992.5", "0.1", "-0.0", "0", "5.", ".5",
             "+12", "1e22", "1e23", "-1e-22",
             "123456789012345678901234567890",
             "0.00000000000000000000000000001",
             "3.141592653589793238462643383279", "1e-310",
             "2.2250738585072011e-308",
             "1.00000000000000011102230246251565404236316680908203125"]
    buf = ("\n".join(vals) + "\n").encode()
    starts, ends, pos = [], [], 0
    for v in vals:
        starts.append(pos)
        pos += len(v)
        ends.append(pos)
        pos += 1
    out = native.parse_columns(buf, np.array(starts, np.int64),
                               np.array(ends, np.int64), [0], 2)
    want = np.array([float(v) for v in vals])
    np.testing.assert_array_equal(out[0].view(np.uint64),
                                  want.view(np.uint64))


def test_parse_columns_fuzz_vs_python():
    """Generative fuzz of the native field parser against Python's
    float()/int(): every emitted numeric shape (fixed decimals,
    exponents, %.17g, long leading zeros, huge ints) must parse
    bit-identically -- the Clinger fast path may never round
    differently from strtod."""
    rng = np.random.default_rng(99)
    floats, ints = [], []
    for _ in range(4000):
        k = rng.integers(0, 6)
        if k == 0:
            floats.append(b"%.5f" % rng.uniform(-1e3, 1e3))
        elif k == 1:
            floats.append(b"%.6e" % (10.0 ** rng.uniform(-300, 300)
                                     * (1, -1)[rng.integers(0, 2)]))
        elif k == 2:
            floats.append(b"%.17g" % rng.uniform(-1, 1))
        elif k == 3:
            floats.append(b"0" * rng.integers(1, 25)
                          + b"%d.%d" % (rng.integers(0, 99),
                                        rng.integers(0, 10**9)))
        elif k == 4:
            floats.append(b"%d" % rng.integers(-10**18, 10**18))
        else:
            floats.append(b"%de%d" % (rng.integers(1, 10**9),
                                      rng.integers(-30, 30)))
        ints.append(b"%d" % rng.integers(-2**63, 2**63 - 1,
                                         dtype=np.int64))
    buf = b"".join(i + b" " + f + b"\n" for i, f in zip(ints, floats))
    starts, ends = native.scan_lines(buf)
    iv, fv = native.parse_columns(buf, starts, ends, [0, 1],
                                  kinds=[1, 0])
    exp_f = np.array([float(f) for f in floats])
    exp_i = np.array([int(i) for i in ints], dtype=np.int64)
    np.testing.assert_array_equal(fv.view(np.uint64),
                                  exp_f.view(np.uint64))
    np.testing.assert_array_equal(iv, exp_i)
