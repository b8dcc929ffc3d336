"""Run the untouched reference Python minh reader (ref python/minh.py) over
a minh file and dump all columns (and per-block reads) to .npz.

Usage: python ref_minh_read.py <in.minh> <out.npz>
"""

import sys

import numpy as np

import minh  # the reference implementation, untouched


def main():
    r = minh.open(sys.argv[1])
    data = r.read(r.names)
    out = {
        "names": np.array("$".join(r.names)),
        "blocks": np.int64(r.blocks),
        "L": np.float64(r.L),
        "boundary": np.float64(r.boundary),
        "cells": np.int64(r.cells),
        "block_lengths": np.asarray(r.block_lengths, dtype=np.int64),
    }
    for i in range(len(r.names)):
        out["col%d" % i] = data[i]
    np.savez(sys.argv[2], **out)
    r.close()


if __name__ == "__main__":
    main()
