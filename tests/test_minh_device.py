"""Device-batched minh reads must equal the host reader exactly
(dither="none") and within dx (uniform)."""

import numpy as np
import pytest

from minnow_tpu.formats import minh, minh_device


def _write_catalog(fname, rng, lens=(100, 37, 100)):
    names = ["id", "x", "mvir"]
    cols = [minh.Column(type=minh.Int),
            minh.Column(type=minh.Float, low=0, high=250, dx=0.01),
            minh.Column(type=minh.Float, log=1, low=5, high=16,
                        dx=0.001)]
    w = minh.create(fname)
    w.header(names, "t", cols)
    w.geometry(250, 0, 0)
    data = []
    for n in lens:
        blk = [rng.integers(0, 10**12, n),
               rng.uniform(0, 249.9, n).astype(np.float32),
               (10.0 ** rng.uniform(5.5, 15.5, n)).astype(np.float32)]
        data.append(blk)
        w.block(blk)
    w.close()
    return names, data


def test_device_reads_match_host(tmp_path):
    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(0)
    _write_catalog(fname, rng)

    r = minh.open(fname, dither="none")
    host_f = r.floats(["x", "mvir"])
    host_i = r.ints(["id"])
    dev_f = minh_device.read_floats(r, ["x", "mvir"], dither="none")
    dev_i = minh_device.read_ints(r, ["id"])
    np.testing.assert_array_equal(dev_f["x"], host_f["x"])
    np.testing.assert_array_equal(dev_f["mvir"], host_f["mvir"])
    np.testing.assert_array_equal(dev_i["id"], host_i["id"])
    r.close()


def test_device_uniform_dither_within_dx(tmp_path):
    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(1)
    names, data = _write_catalog(fname, rng)
    r = minh.open(fname)
    got = minh_device.read_floats(r, ["x"], dither="uniform")["x"]
    want = np.concatenate([blk[1] for blk in data])
    assert np.all(np.abs(got - want) <= 0.01 * (1 + 1e-5))
    again = minh_device.read_floats(r, ["x"], dither="uniform")["x"]
    np.testing.assert_array_equal(got, again)
    r.close()


def test_uniform_dither_host_equals_device_bitwise(tmp_path):
    """One defined uniform stream (VERDICT r4 #5): the host reader's
    pure-numpy counter-hash must equal the device decode bitwise --
    same file, same mode, same floats regardless of read path.  Also
    pins the container-block-index keying (a column-local index on
    either side would break this for every column but the first)."""
    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(2)
    _write_catalog(fname, rng)

    for seed in (0, 9):
        r = minh.open(fname, dither="uniform", seed=seed)
        host = r.floats(["x", "mvir"])
        dev = minh_device.read_floats(r, ["x", "mvir"],
                                      dither="uniform", seed=seed)
        np.testing.assert_array_equal(dev["x"], host["x"])
        np.testing.assert_array_equal(dev["mvir"], host["mvir"])
        r.close()


def test_philox_legacy_mode_reproduces_old_stream(tmp_path):
    """dither="philox" keeps the rounds-1-4 host stream available (and
    distinct from the defined uniform stream)."""
    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(3)
    _write_catalog(fname, rng)

    r_p = minh.open(fname, dither="philox")
    r_u = minh.open(fname, dither="uniform")
    xp = r_p.floats(["x"])["x"]
    xu = r_u.floats(["x"])["x"]
    assert np.any(xp != xu)          # different streams
    assert np.all(np.abs(xp - xu) <= 2 * 0.01 * (1 + 1e-5))
    r_p2 = minh.open(fname, dither="philox")
    np.testing.assert_array_equal(xp, r_p2.floats(["x"])["x"])
    r_p.close(), r_u.close(), r_p2.close()


def test_device_group_path_interpret(tmp_path, monkeypatch):
    """The group-aligned Pallas bulk-decode path (padded to kernel
    alignment) equals the host reader bit-for-bit (interpret mode; the
    real-kernel identity is gated on-chip by validate_pallas_group)."""
    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(3)
    # unaligned (pads to 32768) but within the <=25% padding-waste gate
    n = 30000
    w = minh.create(fname)
    w.header(["x"], "t", [minh.Column(type=minh.Float, low=0, high=250,
                                      dx=0.001)])
    w.geometry(250, 0, 0)
    x = rng.uniform(0, 249.9, n).astype(np.float32)
    x[0], x[1] = 0.0, 249.9  # pin the delta range -> 18-bit block
    w.block([x])
    w.close()

    from minnow_tpu.formats import device_common

    r = minh.open(fname, dither="none")
    host = r.floats(["x"])["x"]
    used = []
    orig = device_common.group_decode

    def spy(*a, **k):
        out = orig(*a, **k)
        used.append(out is not None)
        return out

    monkeypatch.setattr(minh_device, "_group_decode", spy)
    monkeypatch.setattr(device_common, "INTERPRET", True)
    dev = minh_device.read_floats(r, ["x"], dither="none")["x"]
    r.close()
    assert any(used), "group decode path did not engage"
    np.testing.assert_array_equal(dev.view(np.uint32),
                                  host.view(np.uint32))


@pytest.mark.parametrize("n", [32768, 30000])
def test_device_group_int_path_interpret(tmp_path, monkeypatch, n):
    """Bulk int reads engage the group unpack kernels -- wide (ID
    columns, 33-64-bit deltas) and narrow -- and equal the host reader
    exactly (interpret mode).  n=30000 exercises the pad-to-alignment
    branch (words padded to 32768 elements, the tail sliced off)."""
    from minnow_tpu.formats import device_common

    fname = str(tmp_path / "c.minh")
    rng = np.random.default_rng(4)
    # n=32768: odd widths group at G=128 -> exact 32768 alignment
    w = minh.create(fname)
    w.header(["id", "flag"], "t", [minh.Column(type=minh.Int),
                                   minh.Column(type=minh.Int)])
    w.geometry(250, 0, 0)
    ids = rng.integers(0, 10**12, n)  # ~40-bit deltas
    ids[0], ids[1] = 0, (1 << 40) + 5  # pin width > 32
    flags = rng.integers(0, 2, n)     # 1-bit deltas
    w.block([ids, flags])
    w.close()

    r = minh.open(fname)
    host = r.ints(["id", "flag"])
    used = []
    orig = device_common.group_decode_ints

    def spy(*a, **k):
        out = orig(*a, **k)
        used.append(out is not None)
        return out

    monkeypatch.setattr(minh_device.device_common, "group_decode_ints",
                        spy)
    monkeypatch.setattr(device_common, "INTERPRET", True)
    dev = minh_device.read_ints(r, ["id", "flag"])
    r.close()
    assert used and all(used), "group int decode did not engage"
    np.testing.assert_array_equal(dev["id"], host["id"])
    np.testing.assert_array_equal(dev["flag"], host["flag"])


def test_verify_minnow_cli(tmp_path, capsys):
    import pytest

    from minnow_tpu.cli import verify_minnow

    fname = str(tmp_path / "ok.minh")
    rng = np.random.default_rng(2)
    _write_catalog(fname, rng, lens=(10,))
    assert verify_minnow.verify(fname, deep=True) == []

    # crashed-writer file: header never rewritten (zero magic)
    crashed = str(tmp_path / "crashed.minnow")
    data = open(fname, "rb").read()
    open(crashed, "wb").write(b"\0" * 48 + data[48:])
    problems = verify_minnow.verify(crashed)
    assert any("never closed" in p for p in problems)

    # truncated tail
    trunc = str(tmp_path / "trunc.minnow")
    open(trunc, "wb").write(data[:len(data) - 10])
    assert verify_minnow.verify(trunc)

    with pytest.raises(SystemExit) as e:
        verify_minnow.main([fname, crashed])
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "ok" in out and "INVALID" in out


def test_device_group_uniform_dither_interpret(tmp_path, monkeypatch):
    """Uniform-dither bulk reads (the default read mode) engage the
    kernel-unpack + XLA-threefry-tail path and are bit-identical to the
    all-XLA device path (the device dither stream's definition)."""
    from minnow_tpu.formats import device_common

    fname = str(tmp_path / "u.minh")
    rng = np.random.default_rng(6)
    n = 16384  # 18-bit floats group at G=64 -> exact 16384 alignment
    w = minh.create(fname)
    w.header(["x"], "t", [minh.Column(type=minh.Float, low=0.0,
                                      high=250.0, dx=0.001)])
    w.geometry(250, 0, 0)
    w.block([rng.uniform(0, 249.9, n).astype(np.float32)])
    w.block([rng.uniform(0, 249.9, n).astype(np.float32)])
    w.close()

    r = minh.open(fname, dither="uniform")
    # all-XLA reference via the kill switch
    monkeypatch.setenv("MINNOW_TPU_PALLAS_DECODE", "0")
    ref = minh_device.read_floats(r, ["x"], dither="uniform", seed=5)
    monkeypatch.delenv("MINNOW_TPU_PALLAS_DECODE")
    used = []
    orig = device_common.group_decode

    def spy(*a, **k):
        out = orig(*a, **k)
        used.append(out is not None)
        return out

    monkeypatch.setattr(minh_device, "_group_decode", spy)
    monkeypatch.setattr(device_common, "INTERPRET", True)
    got = minh_device.read_floats(r, ["x"], dither="uniform", seed=5)
    r.close()
    assert used and all(used), "uniform group path did not engage"
    np.testing.assert_array_equal(got["x"].view(np.uint32),
                                  ref["x"].view(np.uint32))
