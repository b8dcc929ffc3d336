"""Ingestion layer tests: text reader (in-memory fake files, mirrors
ref go/text/text_test.go), Rockstar dialects, LGadget-2 round-trip
against the mock snapshot (ref go/minp/snapshot/lgadget2_test.go), Grid
re-binning, and the snapshot<->minp conversions."""

import numpy as np
import pytest

from minnow_tpu.formats import minp as minp_fmt
from minnow_tpu.ingest import lgadget2, rockstar, snapshot, text


# ---------------------------------------------------------------------------
# text reader
# ---------------------------------------------------------------------------

CATALOG = b"""# id x mvir
# another comment line
0 1.5 1e10
1 2.5 2e10 # trailing comment
2 3.5 3e10

3 4.5 4e10
"""


def test_text_block_parsing():
    rd = text.open_from_bytes(CATALOG)
    rd.set_names(["id", "x", "mvir"])
    assert rd.blocks() == 1
    out = rd.block(0, ["id", "mvir", "x"],
                   [np.int64, np.float32, np.float32])
    np.testing.assert_array_equal(out["id"], [0, 1, 2, 3])
    np.testing.assert_allclose(out["x"], [1.5, 2.5, 3.5, 4.5])
    np.testing.assert_allclose(out["mvir"], [1e10, 2e10, 3e10, 4e10])


def test_text_headers():
    rd = text.open_from_bytes(CATALOG)
    assert rd.line_header(1) == "# id x mvir"
    assert rd.comment_header() == "# id x mvir\n# another comment line"


def test_text_name_case_insensitive():
    rd = text.open_from_bytes(CATALOG)
    rd.set_names(["ID", "X", "Mvir"])
    out = rd.block(0, ["id"], [np.int64])
    np.testing.assert_array_equal(out["id"], [0, 1, 2, 3])


def test_text_unknown_name():
    rd = text.open_from_bytes(CATALOG)
    rd.set_names(["id", "x", "mvir"])
    with pytest.raises(KeyError):
        rd.block(0, ["nope"])


def test_text_multi_block_boundaries():
    """Block splitting at newlines within the search window
    (ref go/text/text_test.go:142-173)."""
    lines = b"".join(b"%d 10.5\n" % i for i in range(1000))
    cfg = text.ReaderConfig(max_block_size=512, max_item_size=64)
    rd = text.open_from_bytes(lines, cfg)
    assert rd.blocks() > 1
    rd.set_names(["id", "val"])
    got = []
    for b in range(rd.blocks()):
        got.append(rd.block(b, ["id"], [np.int64])["id"])
    np.testing.assert_array_equal(np.concatenate(got), np.arange(1000))


def test_text_column_out_of_range():
    rd = text.open_from_bytes(b"1 2\n3 4\n")
    rd.set_names(["a", "b", "c"])
    with pytest.raises(ValueError, match="line"):
        rd.block(0, ["c"])


def test_text_int64_exact_above_2p53():
    """Int columns parse integer-exactly at all magnitudes (reference
    strconv.Atoi, ref go/text/parse.go:118-121): IDs above 2^53 must
    keep their low bits -- a float64 detour would silently zero them."""
    ids = np.array([2**53 + 1, 2**53 + 3, 2**62 + 12345,
                    -(2**60 + 7), 9223372036854775807,
                    -9223372036854775808, 0, 42], dtype=np.int64)
    buf = b"".join(b"%d 1.5\n" % i for i in ids)
    for threads in (1, 4):
        rd = text.open_from_bytes(buf)
        rd.set_names(["id", "x"])
        rd.set_threads(threads)
        out = rd.block(0, ["id"], [np.int64])
        np.testing.assert_array_equal(out["id"], ids)


def test_text_int64_rejects_float_syntax_and_overflow():
    """Float syntax in an int column is an error, never a truncation;
    so is overflow past int64 (reference strconv.Atoi semantics)."""
    for bad in (b"0 1.0\n1.5 2.0\n",          # float literal
                b"1e3 2.0\n",                  # exponent
                b"9223372036854775808 2.0\n",  # int64 overflow
                b"12a4 2.0\n"):                # junk
        rd = text.open_from_bytes(bad)
        rd.set_names(["id", "x"])
        with pytest.raises(ValueError, match="line"):
            rd.block(0, ["id"], [np.int64])
    # the same fields are fine as FLOAT columns
    rd = text.open_from_bytes(b"0 1.0\n1.5 2.0\n")
    rd.set_names(["id", "x"])
    out = rd.block(0, ["id"], [np.float32])
    np.testing.assert_allclose(out["id"], [0.0, 1.5])


# ---------------------------------------------------------------------------
# rockstar dialects (ref go/text/text_test.go:175-208)
# ---------------------------------------------------------------------------

def test_rockstar_names():
    line = "#ID DescID Mvir Vmax Vrms Rvir"
    assert rockstar.rockstar_names(line) == \
        ["ID", "DescID", "Mvir", "Vmax", "Vrms", "Rvir"]


def test_consistent_trees_names():
    line = "#scale(0) id(1) desc_scale(2) Mvir(10)"
    assert rockstar.consistent_trees_names(line) == \
        ["scale", "id", "desc_scale", "Mvir"]


def test_rockstar_dialect_detection():
    r = rockstar.Rockstar(text.open_from_bytes(
        b"#scale(0) id(1)\n0.5 7\n"))
    assert r.names() == ["scale", "id"]
    r2 = rockstar.Rockstar(text.open_from_bytes(b"#ID Mvir\n7 1e10\n"))
    assert r2.names() == ["ID", "Mvir"]


# ---------------------------------------------------------------------------
# mock snapshot + lgadget2 round trip
# ---------------------------------------------------------------------------

def _mock_snapshot(rng, n_side=8, files=8, l=100.0):
    n = n_side ** 3
    per = n // files
    hd = minp_fmt.Header(z=1.0, scale=0.5, omega_m=0.3, omega_l=0.7,
                         h100=0.7, l=l, epsilon=0.01, n_side=n_side,
                         n_total=n)
    snapshot.calc_uniform_mass(hd)
    ids = rng.permutation(n) + 1  # 1-based, shuffled across files
    x = rng.uniform(0, l * 0.999, (n, 3)).astype(np.float32)
    v = rng.normal(0, 100, (n, 3)).astype(np.float32)
    xs = [x[i * per:(i + 1) * per] for i in range(files)]
    vs = [v[i * per:(i + 1) * per] for i in range(files)]
    id_s = [ids[i * per:(i + 1) * per] for i in range(files)]
    return snapshot.MockSnapshot(hd, xs, vs, id_s), x, v, ids


def test_lgadget2_roundtrip(tmp_path):
    # write LGadget-2 files from the mock, re-read, compare X/V/ID
    # (ref go/minp/snapshot/lgadget2_test.go:38-89)
    rng = np.random.default_rng(1)
    snap, x, v, ids = _mock_snapshot(rng)
    gh = lgadget2.LGadget2Header(
        time=snap.header().scale, redshift=snap.header().z,
        box_size=snap.header().l, omega0=0.3, omega_lambda=0.7,
        hubble_param=0.7,
        n_part_total=(0, snap.header().n_total, 0, 0, 0, 0))
    lgadget2.write_lgadget2(str(tmp_path), "snap_%03d.dat", snap, gh)

    back = lgadget2.LGadget2Snapshot(str(tmp_path))
    assert back.files() == snap.files()
    hd = back.header()
    assert hd.n_total == snap.header().n_total
    assert hd.n_side == snap.header().n_side
    assert hd.l == snap.header().l
    for i in range(back.files()):
        np.testing.assert_allclose(back.read_x(i), snap.read_x(i),
                                   rtol=1e-6)
        np.testing.assert_allclose(back.read_v(i), snap.read_v(i),
                                   rtol=1e-5)
        np.testing.assert_array_equal(back.read_id(i), snap.read_id(i))


def test_lgadget2_corruption_detection(tmp_path):
    rng = np.random.default_rng(2)
    snap, *_ = _mock_snapshot(rng, n_side=4, files=1)
    snap.x[0][3, 1] = np.nan
    gh = lgadget2.LGadget2Header(
        time=0.5, box_size=100.0,
        n_part_total=(0, 64, 0, 0, 0, 0))
    lgadget2.write_lgadget2(str(tmp_path), "s_%d.dat", snap, gh)
    back = lgadget2.LGadget2Snapshot(str(tmp_path))
    with pytest.raises(lgadget2.CorruptionError):
        back.read_x(0)


def test_grid_rebins_by_id(tmp_path):
    rng = np.random.default_rng(3)
    snap, x, v, ids = _mock_snapshot(rng, n_side=8, files=4)
    grid = snapshot.Grid(snap, cells=2)
    assert grid.files() == 8
    # every particle lands at its Lagrangian slot: grid cell c, index i
    for c in range(8):
        got_x = grid.read_x(c)
        got_ids = grid.read_id(c)
        # ids in file order: read_id gives the Lagrangian ids of cell c
        for j in [0, 5, 17]:
            pid = got_ids[j]  # 0-based lagrangian id
            src = np.nonzero(ids - 1 == pid)[0][0]
            np.testing.assert_array_equal(got_x[j], x[src])
    got_v = grid.read_v(3)
    pid = grid.read_id(3)[11]
    src = np.nonzero(ids - 1 == pid)[0][0]
    np.testing.assert_array_equal(got_v[11], v[src])


def test_write_minp_and_read_back_as_snapshot(tmp_path):
    rng = np.random.default_rng(4)
    snap, x, v, ids = _mock_snapshot(rng, n_side=8, files=2)
    snapshot.write_minp(str(tmp_path), "%s_%d.minp", 2, 2, 0.001, 0.1,
                        snap)
    back = snapshot.MinPSnapshot(str(tmp_path), "%s_%d.minp")
    assert back.files() == 8
    grid = snapshot.Grid(snap, 2)
    l = snap.header().l
    for i in (0, 3, 7):
        gx, bx = grid.read_x(i), back.read_x(i)
        d = np.abs(gx - bx)
        d = np.minimum(d, l - d)
        assert d.max() <= 0.001 * (1 + 1e-4)
        gv, bv = grid.read_v(i), back.read_v(i)
        assert np.abs(gv - bv).max() <= 0.1 * (1 + 1e-4)
        np.testing.assert_array_equal(grid.read_id(i), back.read_id(i))
