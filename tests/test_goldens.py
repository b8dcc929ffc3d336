"""Golden-byte regression tests.

The byte layout is pinned by checked-in SHA-256 digests of files written
from fixed inputs.  Round-trip tests prove self-consistency; these prove
*bytes never drift* across refactors (the cross-implementation
byte-compatibility contract of the reference's Go/Python twin suites,
ref go/minnow_test.go + python/minnow_test.py sharing test_files/).

External anchor: the byte layout these digests pin is certified against
the *untouched* reference Python implementation by
``tests/test_crossimpl.py`` -- repo-written containers and minh files are
byte-identical to reference-writer output for fixed/int groups, and
repo-written float groups decode to exact pixel indices through the
reference's own bit kernel.  A digest change here therefore cannot be
waved through by regenerating: it must keep test_crossimpl.py green,
which compares against code this repo does not control.

If a digest changes intentionally (it should essentially never -- the
format is frozen), regenerate with:  python tests/test_goldens.py
"""

import hashlib
import os

import numpy as np

import minnow_tpu as minnow
from minnow_tpu.formats import boundary, minh, minp

GOLDENS = {
    "container.minnow":
        "36efd2d2ab4688893bc378048fa33d6d1d7c884338ae36995b08cb29bf6ae86c",
    "catalog.minh":
        "cb2ddbd189abadb7cf54f869ba105c26389e1327e81cfea380879db2dddbe8f8",
    "boundary.minh":
        "88aa166af485d0f5fc5572e63de662588865c6ef4e37fd576e4bb3976b5b45cb",
    "snapshot.minp":
        "e919e64b8548f3a9c2c694057b511799d3807be2384d2a4b6f597826080bc88a",
}


def _write_container(fname):
    w = minnow.create(fname)
    w.header(b"golden header")
    w.int_group(6)
    w.data(np.array([5, -3, 1000000, 5, 0, 7], np.int64))
    w.float_group(5, (-50.0, 100.0), 0.5)
    w.data(np.array([-50, 0, 50, 99.9, 42.5], np.float32))
    w.data(np.array([1, 2, 3, 4, 5], np.float32))
    w.fixed_size_group(minnow.UINT16_GROUP, 4)
    w.data(np.array([1, 2, 3, 65535], np.uint16))
    w.close()


def _write_catalog(fname):
    rng = np.random.default_rng(12345)
    n = 257
    w = minh.create(fname)
    w.header(["id", "x", "mvir"], "golden catalog",
             [minh.Column(type=minh.Int),
              minh.Column(type=minh.Float, low=0, high=125, dx=0.01),
              minh.Column(type=minh.Float, log=1, low=5, high=16,
                          dx=0.001)])
    w.geometry(125.0, 0, 0)
    w.block([rng.integers(0, 10**12, n),
             rng.uniform(0, 124.9, n).astype(np.float32),
             (10.0 ** rng.uniform(6, 15, n)).astype(np.float32)])
    w.block([rng.integers(0, 10**12, 100),
             rng.uniform(0, 124.9, 100).astype(np.float32),
             (10.0 ** rng.uniform(6, 15, 100)).astype(np.float32)])
    w.close()


def _write_boundary(fname):
    rng = np.random.default_rng(99)
    n = 200
    x = rng.uniform(0, 99.9, n).astype(np.float32)
    y = rng.uniform(0, 99.9, n).astype(np.float32)
    z = rng.uniform(0, 99.9, n).astype(np.float32)
    w = boundary.create_boundary(fname)
    w.header("golden boundary")
    w.geometry(100.0, 7.5, 2)
    w.coordinates(x, y, z)
    w.column("id", minh.Column(type=minh.Int),
             np.arange(n, dtype=np.int64))
    w.column("x", minh.Column(type=minh.Float, low=0, high=100, dx=0.01),
             x)
    w.close()


def _write_snapshot(fname):
    rng = np.random.default_rng(7)
    hd = minp.Header(z=0.5, scale=2 / 3, omega_m=0.3, omega_l=0.7,
                     h100=0.7, l=62.5, epsilon=0.01, n_side=8,
                     n_total=512, uniform_mp=1.5e9)
    w = minp.create(fname)
    w.header(hd, b"raw-header-bytes", minp.Cell(3, 2, 2), 0.001, True)
    w.vectors(rng.uniform(0, 62.4, (64, 3)).astype(np.float32))
    w.close()


_WRITERS = {
    "container.minnow": _write_container,
    "catalog.minh": _write_catalog,
    "boundary.minh": _write_boundary,
    "snapshot.minp": _write_snapshot,
}


def _digest(fname):
    return hashlib.sha256(open(fname, "rb").read()).hexdigest()


def test_golden_bytes(tmp_path):
    for name, writer in _WRITERS.items():
        fname = str(tmp_path / name)
        writer(fname)
        assert _digest(fname) == GOLDENS[name], (
            "%s bytes drifted from the golden digest -- the on-disk "
            "format MUST NOT change" % name)


if __name__ == "__main__":
    os.makedirs("/tmp/goldens", exist_ok=True)
    for name, writer in _WRITERS.items():
        fname = os.path.join("/tmp/goldens", name)
        writer(fname)
        print('    "%s":\n        "%s",' % (name, _digest(fname)))
