"""One-shot Pallas kernel self-certification (ops/selfcheck).

Production paths auto-select the fused kernels; a kernel regression
must degrade to the XLA path in-process, not rely on bench.py's env
kill switches (ADVICE r2)."""

import numpy as np
import pytest

from minnow_tpu.core import spec
from minnow_tpu.ops import selfcheck
from minnow_tpu.parallel.pipeline import BlockEncoder


@pytest.fixture(autouse=True)
def _fresh_verdicts():
    selfcheck.reset()
    yield
    selfcheck.reset()


def test_selfcheck_passes_in_interpret_mode():
    assert selfcheck.kernel_ok("encode", interpret=True)
    assert selfcheck.kernel_ok("decode", interpret=True)


def test_selfcheck_failure_cached_and_warns(monkeypatch):
    calls = []

    def boom(interpret):
        calls.append(interpret)
        raise AssertionError("synthetic kernel divergence")

    monkeypatch.setitem(selfcheck._CHECKS, "encode", boom)
    with pytest.warns(RuntimeWarning, match="self-check"):
        assert not selfcheck.kernel_ok("encode", interpret=True)
    # verdict cached: no re-run, no second warning
    assert not selfcheck.kernel_ok("encode", interpret=True)
    assert len(calls) == 1


def test_selfcheck_env_skip(monkeypatch):
    def boom(interpret):
        raise AssertionError("must not run")

    monkeypatch.setitem(selfcheck._CHECKS, "encode", boom)
    monkeypatch.setenv("MINNOW_TPU_PALLAS_SELFCHECK", "0")
    assert selfcheck.kernel_ok("encode", interpret=True)


def test_encoder_falls_back_to_xla_on_selfcheck_failure(monkeypatch):
    """BlockEncoder(pallas=True) with a failing kernel self-check must
    produce the same bytes through the XLA path."""

    def boom(interpret):
        raise AssertionError("synthetic kernel divergence")

    monkeypatch.setitem(selfcheck._CHECKS, "encode", boom)

    low, high, dx = 0.0, 250.0, 0.001
    pixels = spec.float_group_pixels(low, high, dx)
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 249.9, (3, 4096)).astype(np.float32)
    with pytest.warns(RuntimeWarning, match="self-check"):
        enc = BlockEncoder(pallas=True).encode_float_blocks(
            x, low, high, pixels)
    for i in range(3):
        payload, mn, bits, _ = spec.encode_float_block(
            x[i], low, high, pixels)
        assert enc.payloads[i] == payload
        assert int(enc.mins[i]) == mn
        assert int(enc.bits[i]) == bits


def test_uniform_family_failure_keeps_none_kernel(monkeypatch, tmp_path):
    """A decode_uniform self-check failure must fall the uniform read
    back to XLA WITHOUT disabling the none/midpoint kernel paths, and
    values must still be correct."""
    from minnow_tpu.formats import device_common, minh as minh_mod
    from minnow_tpu.formats import minh_device

    def boom(interpret):
        raise AssertionError("synthetic uniform-hash divergence")

    monkeypatch.setitem(selfcheck._CHECKS, "decode_uniform", boom)

    rng = np.random.default_rng(19)
    n = 16384
    x = rng.uniform(0, 249.9, n).astype(np.float32)
    cols = [minh_mod.Column(type=minh_mod.Float, low=0.0, high=250.0,
                            dx=0.001)]
    fname = str(tmp_path / "u.minh")
    w = minh_mod.create(fname)
    w.header(["x"], "", cols)
    w.geometry(250.0, 0, 0)
    w.block([x])
    w.close()

    r = minh_mod.open(fname, dither="none")
    try:
        device_common.INTERPRET = True
        with pytest.warns(RuntimeWarning, match="self-check"):
            got_u = minh_device.read_floats(r, ["x"],
                                            dither="uniform")["x"]
        # none-mode still allowed to use the kernel (family verdicts
        # are independent)
        assert selfcheck.kernel_ok("decode", interpret=True)
        got_n = minh_device.read_floats(r, ["x"], dither="none")["x"]
    finally:
        device_common.INTERPRET = False
    xla_u = minh_device.read_floats(r, ["x"], dither="uniform")["x"]
    host_n = r.floats(["x"])["x"]
    r.close()
    np.testing.assert_array_equal(got_u.view(np.uint32),
                                  xla_u.view(np.uint32))
    np.testing.assert_array_equal(got_n.view(np.uint32),
                                  host_n.view(np.uint32))
