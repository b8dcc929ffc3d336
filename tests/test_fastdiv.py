"""Integer-exact quantize (ops/fastdiv.py) vs the normative spec,
bitwise, over random + adversarial inputs."""

import numpy as np
import pytest

from minnow_tpu.core import spec
from minnow_tpu.ops import fastdiv


def _check(diff, dx):
    diff = np.asarray(diff, np.float32)
    dx32 = np.float32(dx)
    b, eb, m0, m1, ok = fastdiv.divisor_magic(np.array([dx32]))
    assert ok[0]
    q, exact = fastdiv.quantize_fast(diff, b[0], eb[0], m0[0], m1[0])
    q, exact = np.asarray(q), np.asarray(exact)
    with np.errstate(all="ignore"):
        want = np.floor((diff / dx32).astype(np.float64)).astype(np.int64)
    usable = exact
    mism = np.nonzero((q != want) & usable)[0]
    assert mism.size == 0, (
        "mismatch at diff=%r (%a): want %d got %d (dx=%a)"
        % (diff[mism[0]], float(diff[mism[0]]), want[mism[0]],
           q[mism[0]], float(dx32)))
    return exact


def test_random_divisors_and_values():
    rng = np.random.default_rng(0)
    for _ in range(20):
        dx = np.float32(10.0 ** rng.uniform(-6, 3))
        diff = rng.uniform(-1e6, 1e6, 20000).astype(np.float32)
        exact = _check(diff, dx)
        assert exact.all()


def test_boundary_adversarial():
    rng = np.random.default_rng(1)
    for dx in [np.float32(1 / 7), np.float32(0.001), np.float32(0.25),
               np.float32(3.1e-5)]:
        ks = rng.integers(-(2**22), 2**22, 30000)
        grid = (ks.astype(np.float64) * np.float64(dx)).astype(np.float32)
        diff = np.concatenate([np.nextafter(grid, -np.inf), grid,
                               np.nextafter(grid, np.inf)])
        exact = _check(diff, dx)
        assert exact.all()


def test_rounding_ties():
    # quotients exactly at representable halves: dx=2 with odd integers
    diff = np.arange(-65, 65, dtype=np.float32)
    _check(diff, np.float32(2.0))
    # huge/small quotients
    _check(np.array([1e30, -1e30, 1e-30, -1e-30, 0.0, -0.0], np.float32),
           np.float32(0.5))


def test_subnormal_diff():
    tiny = np.array([1e-40, -1e-40, 5e-39, np.float32(1.4e-45)],
                    np.float32)
    exact = _check(tiny, np.float32(2e-38))  # divisor normal, diff subn.
    assert exact.all()


def test_flags_naninf_and_tiny_quotients():
    b, eb, m0, m1, ok = fastdiv.divisor_magic(np.array([1.0], np.float32))
    q, exact = fastdiv.quantize_fast(
        np.array([np.nan, np.inf, -np.inf, 1.0], np.float32),
        b[0], eb[0], m0[0], m1[0])
    exact = np.asarray(exact)
    assert not exact[0] and not exact[1] and not exact[2]
    assert exact[3] and np.asarray(q)[3] == 1
    # quotient below 2^-120 -> flagged, never silently wrong
    q, exact = fastdiv.quantize_fast(
        np.array([1e-38], np.float32), *[v[0] for v in
                                         fastdiv.divisor_magic(
                                             np.array([1e38],
                                                      np.float32))[:4]])
    assert not np.asarray(exact)[0]


def test_bad_divisors_flagged():
    _, _, _, _, ok = fastdiv.divisor_magic(
        np.array([0.0, -1.0, np.inf, np.nan, 1e-39, 1.0], np.float32))
    assert list(ok) == [False, False, False, False, False, True]


def test_matches_spec_quantize_full_path():
    """End-to-end: diff computed as f32(x - low), then fast floor-divide
    must equal spec.quantize for in-range configs."""
    rng = np.random.default_rng(2)
    for low, high, dx in [(0.0, 250.0, 0.001), (-50.0, 100.0, 1.0),
                          (5.0, 16.0, 0.001), (0.0, 1.0, 1 / 7)]:
        pixels = spec.float_group_pixels(low, high, dx)
        dxq = spec.quantize_dx(low, high, pixels)
        x = rng.uniform(low, high, 50000).astype(np.float32)
        diff = (x - np.float32(low)).astype(np.float32)
        b, eb, m0, m1, ok = fastdiv.divisor_magic(np.array([dxq]))
        q, exact = fastdiv.quantize_fast(diff, b[0], eb[0], m0[0], m1[0])
        assert np.asarray(exact).all()
        want = spec.quantize(x, low, high, pixels)
        np.testing.assert_array_equal(np.asarray(q), want)
