"""inspect_minh: summarize a minh catalog (the analysis smoke-check,
ref scripts/test_minh.py generalized: prints instead of plotting).

Usage:
  python -m minnow_tpu.cli.inspect_minh <file.minh> [column ...]
        [--device]

With ``--device`` bulk column reads run through the batched device
decoder (formats/minh_device.py); values are bit-identical to the host
reader in the ``none`` dither mode used here.
"""

from __future__ import annotations

import sys

import numpy as np

from ..formats import minh


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    device = "--device" in argv
    if device:
        argv.remove("--device")
        from ..utils import backend_guard

        device = backend_guard.device_or_host(device)
    if not argv:
        raise SystemExit(__doc__)
    r = minh.open(argv[0], dither="none")
    print("file      :", argv[0])
    print("file type :", "boundary" if r.file_type else "basic")
    print("rows      :", r.length, "in", r.blocks, "blocks")
    print("geometry  : L=%g boundary=%g cells=%d"
          % (r.l, r.boundary, r.cells))
    print("text      :", (r.text[:60] + "...") if len(r.text) > 60
          else r.text)
    print("columns   :")
    for name, col in zip(r.names, r.columns):
        print("  %-20s %s" % (name, col))

    if device:
        from ..formats import minh_device

        read_floats = lambda names: minh_device.read_floats(  # noqa: E731
            r, names, dither="none")
        read_ints = lambda names: minh_device.read_ints(r, names)  # noqa: E731
    else:
        read_floats = r.floats
        read_ints = r.ints

    names = argv[1:] or r.names
    for name in names:
        c = r.names.index(name)
        col = r.columns[c]
        # compressed columns decode on device; raw fixed columns are a
        # plain host memcpy (nothing for the device to decode)
        if col.type == minh.Float:
            data = read_floats([name])[name]
        elif col.type == minh.Int:
            data = read_ints([name])[name]
        elif col.type == minh.Float32:
            data = r.floats([name])[name]
        elif col.type == minh.Int64:
            data = r.ints([name])[name]
        else:
            continue
        print("%-20s min=%-12.6g max=%-12.6g mean=%-12.6g"
              % (name, data.min(), data.max(),
                 float(np.mean(data.astype(np.float64)))))
    r.close()


if __name__ == "__main__":
    main()
