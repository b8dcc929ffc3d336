"""Run the untouched reference Python reader (ref python/minnow.py) over a
minnow file and dump every data block (plus requested headers) to .npz.

Usage: python ref_container_read.py <in.minnow> <out.npz>

Float-group blocks are dithered by the reference with the legacy numpy
global RNG seeded per block (``random.seed(b)``, ref python/minnow.py:175);
the parent test replicates that stream to recover exact pixel indices.
"""

import sys

import numpy as np

import minnow  # the reference implementation, untouched


def main():
    r = minnow.open(sys.argv[1])
    out = {"n_blocks": np.int64(r.blocks),
           "group_types": np.asarray(
               [r.data_type(b) for b in range(r.blocks)], dtype=np.int64)}
    for b in range(r.blocks):
        out["block%d" % b] = np.asarray(r.data(b))
    np.savez(sys.argv[2], **out)
    r.close()


if __name__ == "__main__":
    main()
