"""Run the untouched reference Python minh writer (ref python/minh.py) over
a catalog loaded from an .npz fixture.

Usage: python ref_minh_write.py <fixture.npz> <out.minh>

npz keys: "meta" (JSON: names, text, cols, blocks, optional geometry) and
"b{block}_c{col}" arrays.
"""

import json
import sys

import numpy as np

import minh  # the reference implementation, untouched


def main():
    npz = np.load(sys.argv[1])
    meta = json.loads(npz["meta"].item())
    cols = [minh.Column(c["type"], log=c["log"], low=c["low"],
                        high=c["high"], dx=c["dx"]) for c in meta["cols"]]
    w = minh.create(sys.argv[2])
    w.header(meta["names"], meta["text"], cols)
    if meta.get("geometry"):
        l, boundary, cells = meta["geometry"]
        w.geometry(l, boundary, cells)
    for b in range(meta["blocks"]):
        w.block([np.ascontiguousarray(npz["b%d_c%d" % (b, c)])
                 for c in range(len(cols))])
    w.close()


if __name__ == "__main__":
    main()
