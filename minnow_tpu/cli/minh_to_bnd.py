"""minh_to_bnd: convert basic minh catalogs to the spatial boundary
layout (ref scripts/minh_to_bnd.go).

Usage:
  python -m minnow_tpu.cli.minh_to_bnd <cells> <boundary> <glob> <outdir>
"""

from __future__ import annotations

import glob as globmod
import os
import sys
import time

import numpy as np

from ..formats import boundary, minh


def out_name(out_dir: str, fname: str) -> str:
    """(ref minh_to_bnd.go:41-50)"""
    base = os.path.basename(fname)
    toks = base.split(".")
    toks = toks[:-1] + ["bnd", "minh"] if len(toks) > 1 \
        else [base, "bnd", "minh"]
    return os.path.join(out_dir, ".".join(toks))


def convert_file(in_name: str, out_name_: str, cells: int,
                 bnd: float) -> None:
    """(ref minh_to_bnd.go:52-78)"""
    rd = minh.open(in_name)
    w = boundary.create_boundary(out_name_)
    w.header(rd.text)
    w.geometry(rd.l, np.float32(bnd), cells)

    coord = rd.floats(["x", "y", "z"])
    w.coordinates(coord["x"], coord["y"], coord["z"])

    for i, name in enumerate(rd.names):
        col = rd.columns[i]
        if col.type in (minh.Float, minh.Float32):
            data = rd.floats([name])[name]
        elif col.type in (minh.Int, minh.Int64):
            data = rd.ints([name])[name]
        else:
            continue
        w.column(name, col, data)
    w.close()
    rd.close()


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 4:
        raise SystemExit(__doc__)
    cells = int(argv[0])
    bnd = float(argv[1])
    for fname in globmod.glob(argv[2]):
        print("Converting", fname)
        t0 = time.time()
        convert_file(fname, out_name(argv[3], fname), cells, bnd)
        print("    %.2f minutes" % ((time.time() - t0) / 60))


if __name__ == "__main__":
    main()
