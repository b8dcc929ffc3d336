"""minh format round-trips (mirrors ref go/minh/minh_test.go:10-117)."""

import numpy as np
import pytest

from minnow_tpu.formats import minh


def _example_data(rng, n):
    return {
        "int64": rng.integers(-(2**40), 2**40, n, dtype=np.int64),
        "int": rng.integers(0, 10**12, n, dtype=np.int64),
        "float32": rng.uniform(-1, 1, n).astype(np.float32),
        "float": rng.uniform(0, 100, n).astype(np.float32),
        "logfloat": (10.0 ** rng.uniform(1, 5, n)).astype(np.float32),
    }


def _columns():
    return [
        minh.Column(type=minh.Int64),
        minh.Column(type=minh.Int),
        minh.Column(type=minh.Float32),
        minh.Column(type=minh.Float, low=0, high=100, dx=0.01),
        minh.Column(type=minh.Float, log=1, low=1, high=5, dx=0.001),
    ]


NAMES = ["int64", "int", "float32", "float", "logfloat"]


def test_minh_roundtrip(tmp_path):
    fname = str(tmp_path / "test.minh")
    rng = np.random.default_rng(1)
    blocks = [_example_data(rng, 100), _example_data(rng, 30)]

    w = minh.create(fname)
    w.header(NAMES, "cats are great", _columns())
    w.geometry(100.0, 10.0, 4)
    for blk in blocks:
        w.block([blk[n] for n in NAMES])
    w.close()

    r = minh.open(fname, dither="uniform")
    assert r.names == NAMES
    assert r.text == "cats are great"
    assert r.blocks == 2
    assert r.block_lengths == [100, 30]
    assert r.length == 130
    assert (r.l, r.boundary, r.cells) == (100.0, 10.0, 4)
    assert r.columns[3].type == minh.Float
    assert r.columns[4].log == 1

    ints = r.ints(["int64", "int"])
    want64 = np.concatenate([b["int64"] for b in blocks])
    wanti = np.concatenate([b["int"] for b in blocks])
    np.testing.assert_array_equal(ints["int64"], want64)
    np.testing.assert_array_equal(ints["int"], wanti)

    floats = r.floats(["float32", "float", "logfloat"])
    wantf32 = np.concatenate([b["float32"] for b in blocks])
    np.testing.assert_array_equal(floats["float32"], wantf32)

    wantf = np.concatenate([b["float"] for b in blocks])
    assert np.all(np.abs(floats["float"] - wantf) <= 0.01 * (1 + 1e-5))

    wantlog = np.concatenate([b["logfloat"] for b in blocks])
    # dx = 0.001 in log10 space -> relative tolerance 10**0.001
    ratio = floats["logfloat"] / wantlog
    assert np.all(ratio < 10 ** 0.00101) and np.all(ratio > 10 ** -0.00101)

    # per-block reads agree with concatenated reads
    blk1 = r.float_block(1, ["float"])
    np.testing.assert_array_equal(blk1["float"], floats["float"][100:])
    r.close()


def test_minh_clamp(tmp_path):
    """Values outside [low, high) are clamped before quantization
    (ref go/minh/minh.go:141-149)."""
    fname = str(tmp_path / "clamp.minh")
    x = np.array([-5.0, 0.0, 50.0, 99.9, 100.0, 150.0], dtype=np.float32)
    w = minh.create(fname)
    w.header(["x"], "", [minh.Column(type=minh.Float, low=0, high=100,
                                     dx=0.5)])
    w.geometry(100, 0, 0)
    w.block([x])
    w.close()

    r = minh.open(fname, dither="none")
    got = r.floats(["x"])["x"]
    assert got[0] >= 0.0 - 0.5 and got[0] <= 0.5
    assert got[4] <= 100.0 and got[5] <= 100.0
    assert abs(got[2] - 50.0) <= 0.5
    r.close()


def test_minh_wrong_magic(tmp_path):
    import minnow_tpu as minnow

    fname = str(tmp_path / "notminh.minnow")
    w = minnow.create(fname)
    w.header(b"\0" * 24)
    w.close()
    with pytest.raises(ValueError, match="not a minh file"):
        minh.open(fname)


def test_minh_column_count_mismatch(tmp_path):
    w = minh.create(str(tmp_path / "x.minh"))
    w.header(["a"], "", [minh.Column(type=minh.Int64)])
    with pytest.raises(ValueError, match="Expected 1 columns"):
        w.block([np.zeros(3, np.int64), np.zeros(3, np.int64)])


def test_minh_missing_name(tmp_path):
    fname = str(tmp_path / "y.minh")
    w = minh.create(fname)
    w.header(["a"], "", [minh.Column(type=minh.Int64)])
    w.block([np.arange(3, dtype=np.int64)])
    w.close()
    r = minh.open(fname)
    with pytest.raises(KeyError, match="not in Reader.Names"):
        r.ints(["b"])
    r.close()


def test_gomath_log10_sane():
    """fdlibm log10 agrees with the platform libm to <= 1 ulp(f64) and is
    exact for powers of ten within f32 interest range."""
    import math

    from minnow_tpu.core import gomath

    rng = np.random.default_rng(2)
    x = 10.0 ** rng.uniform(-30, 30, 20000)
    # the underlying fdlibm natural log agrees with the platform libm to a
    # couple of f64 ulps (different algorithms)
    got_ln = gomath.log(x)
    want_ln = np.array([math.log(v) for v in x])
    assert np.all(np.abs(got_ln - want_ln)
                  <= 2 * np.spacing(np.abs(want_ln)))
    # log10 uses Go's log2-based formula, which cancels near x ~ 1 exactly
    # as Go does; at the float32 level (what reaches disk) it agrees with
    # libm essentially always
    got = gomath.log10(x)
    want = np.array([math.log10(v) for v in x])
    frac = np.mean(np.float32(got) != np.float32(want))
    assert frac < 1e-3
    np.testing.assert_array_equal(gomath.log2(np.array([0.25, 0.5, 1, 2,
                                                        1024.0])),
                                  [-2, -1, 0, 1, 10])


def test_gomath_matches_on_jax_cpu():
    import minnow_tpu.ops  # noqa: F401 - enables jax_enable_x64
    import jax.numpy as jnp

    from minnow_tpu.core import gomath

    rng = np.random.default_rng(3)
    x = 10.0 ** rng.uniform(-10, 10, 5000)
    a = gomath.log10(x, np)
    b = np.asarray(gomath.log10(jnp.asarray(x), jnp))
    np.testing.assert_array_equal(a, b)
