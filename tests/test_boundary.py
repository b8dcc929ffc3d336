"""Boundary geometry + round-trip tests
(mirrors ref go/minh/minh_test.go:120-404)."""

import numpy as np

from minnow_tpu.formats import boundary, minh


def _region_scalar(ix, x, sb):
    out = boundary.region(np.array([ix]), np.array([x], np.float32),
                          np.float32(sb))
    return int(out[0])


def test_region_table():
    # (ref go/minh/minh_test.go:120-153 style): cell [2,3), sb=0.25
    cases = [
        (2, 2.0, 0.25, -1),
        (2, 2.1, 0.25, -1),
        (2, 2.25, 0.25, 0),
        (2, 2.5, 0.25, 0),
        (2, 2.74, 0.25, 0),
        (2, 2.75, 0.25, 1),
        (2, 2.99, 0.25, 1),
        (0, 0.1, 0.0, 0),  # no boundary -> never -1/+1
        (0, 0.0, 0.0, 0),
    ]
    for ix, x, sb, want in cases:
        assert _region_scalar(ix, x, sb) == want, (ix, x, sb)


def test_idx_reg():
    # cells=4, l=100, dx=25, sb computed from boundary=5 -> 0.2
    cells, l = 4, np.float32(100)
    sb = np.float32(5) / (l / np.float32(cells))
    coord = np.array([[10.0, 29.0, 99.0, 100.0],
                      [26.0, 52.0, 74.0, 1.0],
                      [0.0, 96.0, 50.0, 62.5]], dtype=np.float32)
    vec = coord / (l / np.float32(cells))
    idx, reg = boundary.idx_reg(vec, cells, l, sb)
    np.testing.assert_array_equal(idx[0], [0, 1, 3, 0])  # 100 wraps to 0
    np.testing.assert_array_equal(idx[1], [1, 2, 2, 0])
    np.testing.assert_array_equal(idx[2], [0, 3, 2, 2])
    # 10/25=0.4 in cell 0 -> interior; 29/25=1.16 < 1.2 -> lower boundary
    # of cell 1 (x=30 would sit exactly at the edge: strict <, region 0)
    assert reg[0][0] == 0 and reg[0][1] == -1
    # 99/25=3.96 -> upper boundary of 3; wrapped 100 -> region -1
    assert reg[0][2] == 1 and reg[0][3] == -1
    # 62.5/25 = 2.5 -> interior
    assert reg[2][3] == 0


def test_host_cells_counts():
    # interior point -> 1 cell; face -> 2; edge -> 4; corner -> 8
    cells = 4
    idx = np.array([[1, 1, 1, 1],
                    [1, 1, 1, 1],
                    [1, 1, 1, 1]])
    reg = np.array([[0, 1, 1, -1],
                    [0, 0, 1, -1],
                    [0, 0, 0, -1]])
    table, flags = boundary.host_cells_table(idx, reg, cells)
    counts = (table >= 0).sum(axis=1)
    np.testing.assert_array_equal(counts, [1, 2, 4, 8])
    # primary cell is slot 0 with flag 0
    g = 1 + 1 * 4 + 1 * 16
    assert (table[:, 0] == g).all()
    assert (flags[:, 0] == 0).all()
    assert (flags[:, 1:][table[:, 1:] >= 0] == 1).all()
    # face point at reg=(+1,0,0): ghost is x+1
    assert table[1, 1] == 2 + 4 + 16
    # corner at reg=(-1,-1,-1): ghosts wrap to x-1,y-1,z-1
    assert set(table[3][table[3] >= 0]) == {
        ix + iy * 4 + iz * 16
        for ix in (1, 0) for iy in (1, 0) for iz in (1, 0)}


def test_boundary_roundtrip(tmp_path):
    """Full boundary file round trip with hand-computed membership
    (ref go/minh/minh_test.go:336-404)."""
    fname = str(tmp_path / "bnd.minh")
    l, cells, bnd = 100.0, 2, 10.0
    # points: cell centers (interior) + one face-boundary point
    x = np.array([25.0, 75.0, 25.0, 48.0], np.float32)
    y = np.array([25.0, 25.0, 75.0, 25.0], np.float32)
    z = np.array([25.0, 25.0, 25.0, 25.0], np.float32)
    ids = np.array([10, 11, 12, 13], np.int64)

    w = boundary.create_boundary(fname)
    w.header("btest")
    w.geometry(l, bnd, cells)
    w.coordinates(x, y, z)
    w.column("id", minh.Column(type=minh.Int), ids)
    w.column("x", minh.Column(type=minh.Float, low=0, high=l, dx=0.01), x)
    w.close()

    r = minh.open(fname, dither="none")
    assert r.names == ["boundary", "id", "x"]
    assert r.blocks == 8
    assert r.cells == 2 and r.boundary == bnd and r.l == l
    # point 3 at x=48 is within 10 of the cell-0/cell-1 face -> ghost in
    # cell 1 (+x); points 0..2 are interior to cells 0,1,2
    got = r.ints(["id", "boundary"])
    # cell 0 holds ids 10 (flag 0) and 13 (flag 0)
    b0 = r.int_block(0, ["id", "boundary"])
    assert list(b0["id"]) == [10, 13]
    assert list(b0["boundary"]) == [0, 0]
    # cell 1 (+x) holds id 11 (flag 0) and ghost 13 (flag 1)
    b1 = r.int_block(1, ["id", "boundary"])
    assert sorted(b1["id"]) == [11, 13]
    flag_of_13 = b1["boundary"][list(b1["id"]).index(13)]
    assert flag_of_13 == 1
    # total entries = 4 + 1 ghost
    assert len(got["id"]) == 5
    # float column decodes within dx
    fx = r.floats(["x"])["x"]
    bx0 = r.float_block(0, ["x"])["x"]
    assert np.abs(bx0[0] - 25.0) <= 0.011
    assert len(fx) == 5
    # geometry helpers
    assert r.is_boundary()
    assert r.cell_width() == 50.0
    np.testing.assert_array_equal(r.cell_origin(1), [50.0, 0, 0])
    np.testing.assert_array_equal(r.block_origin(0), [90.0, 90.0, 90.0])
    assert r.block_width() == 70.0
    r.close()


def test_boundary_insertion_order_is_point_order(tmp_path):
    """Within a cell, entries appear in ascending point order, ghosts
    interleaved exactly as the reference inserts them."""
    fname = str(tmp_path / "ord.minh")
    l, cells, bnd = 100.0, 2, 10.0
    # two points in cell 0; second also ghosts into cell 1
    x = np.array([10.0, 45.0, 30.0], np.float32)
    y = np.array([25.0, 25.0, 25.0], np.float32)
    z = np.array([25.0, 25.0, 25.0], np.float32)
    w = boundary.create_boundary(fname)
    w.header("")
    w.geometry(l, bnd, cells)
    w.coordinates(x, y, z)
    w.column("ix", minh.Column(type=minh.Int),
             np.array([0, 1, 2], np.int64))
    w.close()
    r = minh.open(fname)
    b0 = r.int_block(0, ["ix"])
    assert list(b0["ix"]) == [0, 1, 2]
    r.close()


def test_normalize_coords():
    coord = np.array([[95.0, 1.0, 30.0],
                      [5.0, 5.0, 5.0],
                      [5.0, 5.0, 5.0]])
    out = minh.normalize_coords(coord, 100.0, np.array([90.0, 0.0, 0.0]),
                                30.0)
    np.testing.assert_allclose(out[0], [5.0, 11.0, 30.0])  # 30 clipped
    np.testing.assert_allclose(out[1], [5.0, 5.0, 5.0])


def _brute_force_membership(x, y, z, l, cells, bnd):
    """Literal per-point transcription of the reference's assignment
    loops (ref go/minh/boundary.go:54-152), used as ground truth."""
    import math

    dx = np.float32(l) / np.float32(cells)
    sb = np.float32(bnd) / dx
    members = [[] for _ in range(cells ** 3)]
    flags = [[] for _ in range(cells ** 3)]
    for i in range(len(x)):
        vec = [np.float32(x[i]) / dx, np.float32(y[i]) / dx,
               np.float32(z[i]) / dx]
        idx, reg = [0] * 3, [0] * 3
        for k in range(3):
            idx[k] = int(vec[k])
            if idx[k] >= cells:
                idx[k] -= cells
                vec[k] = np.float32(vec[k] - np.float32(l))
            low = np.float32(idx[k])
            if vec[k] < low + sb:
                reg[k] = -1
            elif vec[k] >= low + 1 - sb:
                reg[k] = 1
        gs = [idx[0] + idx[1] * cells + idx[2] * cells * cells]
        for zb in (0, 1):
            if reg[2] == 0 and zb == 1:
                continue
            for yb in (0, 1):
                if reg[1] == 0 and yb == 1:
                    continue
                for xb in (0, 1):
                    if reg[0] == 0 and xb == 1:
                        continue
                    d = [xb * reg[0], yb * reg[1], zb * reg[2]]
                    if d == [0, 0, 0]:
                        continue
                    v = [0] * 3
                    for k in range(3):
                        v[k] = idx[k] + d[k]
                        if v[k] < 0:
                            v[k] += cells
                        if v[k] >= cells:
                            v[k] -= cells
                    gs.append(v[0] + v[1] * cells + v[2] * cells * cells)
        members[gs[0]].append(i)
        flags[gs[0]].append(0)
        for g in gs[1:]:
            members[g].append(i)
            flags[g].append(1)
    return members, flags


def test_boundary_membership_matches_brute_force(tmp_path):
    """Vectorized assignment == literal reference loops on random data,
    including wrap-around and corner duplication."""
    rng = np.random.default_rng(31337)
    l, cells, bnd = 100.0, 3, 8.0
    n = 500
    # bias points toward edges to stress boundary regions
    x = (rng.uniform(-2, 102, n) % 100).astype(np.float32)
    y = (rng.uniform(-2, 102, n) % 100).astype(np.float32)
    z = (rng.uniform(-2, 102, n) % 100).astype(np.float32)

    fname = str(tmp_path / "bf.minh")
    w = boundary.create_boundary(fname)
    w.header("")
    w.geometry(l, bnd, cells)
    w.coordinates(x, y, z)
    w.column("pid", minh.Column(type=minh.Int),
             np.arange(n, dtype=np.int64))
    w.close()

    want_members, want_flags = _brute_force_membership(
        x, y, z, l, cells, bnd)

    r = minh.open(fname)
    for c in range(cells ** 3):
        blk = r.int_block(c, ["pid", "boundary"])
        assert list(blk["pid"]) == want_members[c], c
        assert list(blk["boundary"]) == want_flags[c], c
    r.close()


def test_device_boundary_writer_byte_identical(tmp_path):
    """DeviceBoundaryWriter (all cells of a column in one batched device
    encode) produces the byte-identical file to the host per-cell loop,
    including empty cells and ragged cell sizes
    (ref go/minh/boundary.go:184-225)."""
    from minnow_tpu.formats.boundary_device import DeviceBoundaryWriter

    rng = np.random.default_rng(17)
    l, cells, bnd = 100.0, 4, 5.0
    n = 800
    # cluster the points so several of the 64 cells stay empty
    x = (rng.uniform(0, 0.4, n) * l).astype(np.float32)
    y = (rng.uniform(0, 0.6, n) * l).astype(np.float32)
    z = (rng.uniform(0.5, 1.0, n) * l).astype(np.float32)
    ids = rng.integers(0, 10**12, n).astype(np.int64)
    mvir = rng.uniform(1e9, 1e14, n).astype(np.float32)

    def write(fname, device):
        w = boundary.create_boundary(fname)
        if device:
            w = DeviceBoundaryWriter(w)
        w.header("device-boundary test")
        w.geometry(l, bnd, cells)
        w.coordinates(x, y, z)
        w.column("id", minh.Column(type=minh.Int), ids)
        w.column("x", minh.Column(type=minh.Float, low=0, high=l,
                                  dx=0.001), x)
        w.column("mvir", minh.Column(type=minh.Float, low=1e9, high=1e14,
                                     dx=1e8), mvir)
        w.column("raw", minh.Column(type=minh.Float32), x)
        w.close()

    host_f = str(tmp_path / "host.minh")
    dev_f = str(tmp_path / "dev.minh")
    write(host_f, device=False)
    write(dev_f, device=True)
    host_bytes = open(host_f, "rb").read()
    dev_bytes = open(dev_f, "rb").read()
    assert host_bytes == dev_bytes
