"""Run the untouched reference Python writer (ref python/minnow.py) over a
plan loaded from an .npz fixture.

Usage: python ref_container_write.py <fixture.npz> <out.minnow>

Must run with PYTHONPATH = /root/reference/python : <cy_bit_shim dir>.
The plan is a JSON list of ops: {"op": "header"|"fixed_group"|"int_group"|
"data", ...}; array payloads live in the npz under op["key"].
"""

import json
import sys

import numpy as np

import minnow  # the reference implementation, untouched


def main():
    npz = np.load(sys.argv[1])
    plan = json.loads(npz["plan"].item())
    w = minnow.create(sys.argv[2])
    for op in plan:
        kind = op["op"]
        if kind == "header":
            w.header(np.ascontiguousarray(npz[op["key"]]))
        elif kind == "fixed_group":
            w.fixed_size_group(int(op["gt"]), int(op["n"]))
        elif kind == "int_group":
            w.int_group(int(op["n"]))
        elif kind == "data":
            w.data(np.ascontiguousarray(npz[op["key"]]))
        else:
            raise ValueError(kind)
    w.close()


if __name__ == "__main__":
    main()
