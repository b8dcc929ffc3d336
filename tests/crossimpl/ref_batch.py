"""Batch driver: run MANY reference-stack jobs in ONE subprocess.

The generative cross-impl fuzz (tests/test_crossimpl_fuzz.py) pushes
~100 random fixtures through the untouched reference Python stack; one
interpreter per fixture would dominate the runtime, so this driver
executes a manifest of jobs sequentially.

Usage: python ref_batch.py <manifest.txt>

Each manifest line: ``<mode> <in_path> <out_path>`` with mode one of
container_write | container_read | minh_write | minh_read -- the same
contracts as the four single-job drivers in this directory.

Must run with PYTHONPATH = /root/reference/python : <cy_bit_shim dir>.
"""

import json
import sys

import numpy as np

import minh  # the reference implementation, untouched
import minnow  # the reference implementation, untouched


def container_write(npz_path, out_path):
    npz = np.load(npz_path)
    plan = json.loads(npz["plan"].item())
    w = minnow.create(out_path)
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


def container_read(in_path, out_path):
    r = minnow.open(in_path)
    out = {"n_blocks": np.int64(r.blocks),
           "group_types": np.asarray(
               [r.data_type(b) for b in range(r.blocks)], dtype=np.int64)}
    for b in range(r.blocks):
        out["block%d" % b] = np.asarray(r.data(b))
    np.savez(out_path, **out)
    r.close()


def minh_write(npz_path, out_path):
    npz = np.load(npz_path)
    meta = json.loads(npz["meta"].item())
    cols = [minh.Column(c["type"], log=c["log"], low=c["low"],
                        high=c["high"], dx=c["dx"]) for c in meta["cols"]]
    w = minh.create(out_path)
    w.header(meta["names"], meta["text"], cols)
    if meta.get("geometry"):
        l, boundary, cells = meta["geometry"]
        w.geometry(l, boundary, cells)
    for b in range(meta["blocks"]):
        w.block([np.ascontiguousarray(npz["b%d_c%d" % (b, c)])
                 for c in range(len(cols))])
    w.close()


def minh_read(in_path, out_path):
    r = minh.open(in_path)
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
    np.savez(out_path, **out)
    r.close()


MODES = {"container_write": container_write,
         "container_read": container_read,
         "minh_write": minh_write,
         "minh_read": minh_read}


def main():
    with open(sys.argv[1]) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            mode, in_path, out_path = line.split()
            MODES[mode](in_path, out_path)


if __name__ == "__main__":
    main()
