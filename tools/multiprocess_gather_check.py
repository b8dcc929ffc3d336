"""Multi-process validation of parallel/distributed.gather_blocks.

Four JAX processes (CPU backend, local coordinator) encode *unequal*
per-process shares of the row-blocks of a small catalog (ragged block
lengths included), gather them with gather_blocks, and process 0 writes
a complete **minh** file from the gathered streams -- which must be
byte-identical to a plain single-process host minh write of the full
catalog (the ordered multi-host writer contract, process-major global
block order, ref go/block_index.go:16-23).

Usage (tests/test_distributed.py drives the 2-process variant every
suite run; manual 4-process run):
  python tools/multiprocess_gather_check.py [--procs=N]
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile

# global row-blocks (ragged sizes), dealt process-major and contiguous
# (gather_blocks returns process-major order, so ownership must be a
# contiguous split for gathered index == global block index);
# 11 blocks keep the per-process counts UNEQUAL for 2/3/4/8 processes
BLOCK_SIZES = [61, 48, 64, 33, 57, 29, 71, 44, 52, 38, 66]
L, EPS = 100.0, 0.01
MVIR_LO, MVIR_HI = 1e9, 1e15


def owner_counts(num_procs: int) -> list[int]:
    """Contiguous split of the row-blocks, earlier processes taking the
    remainder -- always UNEQUAL counts for num_procs in {2, 3, 4, 8}."""
    n = len(BLOCK_SIZES)
    base, rem = divmod(n, num_procs)
    return [base + (1 if i < rem else 0) for i in range(num_procs)]


def owners(num_procs: int) -> list[int]:
    out = []
    for p, c in enumerate(owner_counts(num_procs)):
        out.extend([p] * c)
    return out


def make_catalog():
    import numpy as np

    rng = np.random.default_rng(7)
    blocks = []
    base = 0
    for n in BLOCK_SIZES:
        ids = np.arange(n, dtype=np.int64) * 13 + base
        x = rng.uniform(0, L - 0.1, n).astype(np.float32)
        mvir = rng.uniform(MVIR_LO, MVIR_HI, n).astype(np.float32)
        blocks.append((ids, x, mvir))
        base += n * 13
    return blocks


def minh_cols():
    from minnow_tpu.formats import minh

    return ["id", "x", "mvir"], [
        minh.Column(type=minh.Int),
        minh.Column(type=minh.Float, low=0.0, high=L, dx=EPS),
        minh.Column(type=minh.Float, low=MVIR_LO, high=MVIR_HI, dx=1e9),
    ]


def write_host_minh(path, blocks):
    """Plain single-process reference write."""
    from minnow_tpu.formats import minh

    names, cols = minh_cols()
    w = minh.create(path)
    w.header(names, "multiprocess gather check", cols)
    w.geometry(L, 0, 0)
    for ids, x, mvir in blocks:
        w.block([ids, x, mvir])
    w.close()


def worker(process_id: int, num: int, port: int, out_file: str,
           mode: str = "auto") -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:%d" % port,
        num_processes=num, process_id=process_id)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from minnow_tpu.core import spec
    from minnow_tpu.formats import minh
    from minnow_tpu.parallel import BlockEncoder
    from minnow_tpu.parallel.distributed import gather_blocks

    blocks = make_catalog()
    names, cols = minh_cols()
    ow = owners(num)
    mine = [i for i, o in enumerate(ow) if o == process_id]

    be = BlockEncoder()

    # int column: one encoded block per owned row-block (ragged lens)
    n_max = max(BLOCK_SIZES)
    ib = np.zeros((len(mine), n_max), np.int64)
    ilens = np.zeros(len(mine), np.int64)
    for r, g in enumerate(mine):
        ids = blocks[g][0]
        ib[r, :len(ids)] = ids
        ilens[r] = len(ids)
    gmode = None if mode == "auto" else mode
    enc_i = gather_blocks(be.encode_int_blocks(ib, lens=ilens),
                          mode=gmode)

    # float columns: flatten (row-block, col) process-major
    fcols = [1, 2]  # x, mvir
    fb = np.zeros((len(mine) * len(fcols), n_max), np.float32)
    flens = np.zeros(len(mine) * len(fcols), np.int64)
    flow = np.zeros(len(mine) * len(fcols), np.float32)
    fhigh = np.zeros(len(mine) * len(fcols), np.float32)
    fpix = np.zeros(len(mine) * len(fcols), np.int64)
    k = 0
    for r, g in enumerate(mine):
        for c in fcols:
            col = cols[c]
            data = minh.process_float_column(blocks[g][c], col)
            fb[k, :len(data)] = data
            flens[k] = len(data)
            flow[k] = col.low
            fhigh[k] = col.high
            fpix[k] = spec.float_group_pixels(col.low, col.high, col.dx)
            k += 1
    enc_f = gather_blocks(be.encode_float_blocks(
        fb, flow, fhigh, fpix, lens=flens), mode=gmode)

    mp_file = out_file + ".minh"
    if process_id == 0:
        # coordinator writes ONE minh file from the gathered streams
        w = minh.create(mp_file)
        w.header(names, "multiprocess gather check", cols)
        w.geometry(L, 0, 0)
        fi = 0
        for g, (ids, x, mvir) in enumerate(blocks):
            n = BLOCK_SIZES[g]
            w.block_sizes.append(n)
            w.blocks += 1
            # column order: id (Int), x (Float), mvir (Float)
            w.f.int_group(n)
            w.f.data_encoded(enc_i.payloads[g], int(enc_i.mins[g]),
                             int(enc_i.bits[g]))
            for _ in range(2):
                col = cols[1 + (fi % 2)]
                w.f.float_group(n, (col.low, col.high), col.dx)
                w.f.data_encoded(enc_f.payloads[fi],
                                 int(enc_f.mins[fi]),
                                 int(enc_f.bits[fi]))
                fi += 1
        w.close()
        with open(out_file, "wb") as f:
            pickle.dump({"mp_file": mp_file,
                         "counts": [len(m) for m in [
                             [i for i, o in enumerate(ow) if o == p]
                             for p in range(num)]]}, f)

    # ---- sharded READ-BACK (the decode direction of the distributed
    # contract, ref go/reader.go:114-127): wait for the coordinator's
    # write, then every process decodes its OWNED row-blocks from the
    # shared file through the device decode path and bit-compares them
    # to the host reader
    from minnow_tpu.parallel.distributed import barrier

    barrier("minh_written")
    r = minh.open(mp_file, dither="none")
    ok = True
    for g in mine:
        n = BLOCK_SIZES[g]
        host_i = r.int_block(g, ["id"])["id"]
        host_f = r.float_block(g, ["x"])["x"]
        raw_i = r.f.raw_block(r._block_idx(0, g))
        raw_f = r.f.raw_block(r._block_idx(1, g))
        dec_i = be.decode_int_blocks(
            [raw_i[0]], [raw_i[1]], [raw_i[2]], n)[0]
        lowp, highp, pixp, perp = raw_f[4]
        dec_f = be.decode_float_blocks(
            [raw_f[0]], [raw_f[1]], [raw_f[2]], lowp, highp, pixp, n,
            periodic=perp, dither="none")[0]
        ok = ok and np.array_equal(dec_i, host_i) \
            and np.array_equal(dec_f.view(np.uint32),
                               host_f.view(np.uint32))
    r.close()
    with open(out_file + ".dec%d" % process_id, "w") as f:
        f.write("ok" if ok else "MISMATCH")


def main(num_procs: int = 4, mode: str = "auto") -> int:
    # bind-then-release a free port: a fixed port collides when the
    # suite-driven 2-process run and a manual run overlap
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    out_file = tempfile.mktemp(suffix=".pkl")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(i), str(num_procs), str(port), out_file, mode],
            env=env)
        for i in range(num_procs)
    ]
    rc = 0
    for p in procs:
        if p.wait(timeout=180) != 0:
            print("worker failed")
            rc = 1
    if rc:
        return rc

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    with open(out_file, "rb") as f:
        got = pickle.load(f)
    assert got["counts"] == owner_counts(num_procs), got["counts"]

    ref_file = out_file + ".ref.minh"
    write_host_minh(ref_file, make_catalog())
    mp_bytes = open(got["mp_file"], "rb").read()
    ref_bytes = open(ref_file, "rb").read()
    assert mp_bytes == ref_bytes, "multiprocess minh differs from host"
    for p in range(num_procs):
        with open(out_file + ".dec%d" % p) as f:
            assert f.read() == "ok", \
                "sharded decode mismatch on process %d" % p
    print("multiprocess gather OK: %d processes (mode=%s), unequal "
          "block counts %s, ragged lens, coordinator-written minh "
          "byte-identical to a single-process host write (%d bytes); "
          "sharded read-back bit-exact on every process"
          % (num_procs, mode, got["counts"], len(mp_bytes)))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5],
               sys.argv[6] if len(sys.argv) > 6 else "auto")
    else:
        n, mode = 4, "auto"
        for a in sys.argv[1:]:
            if a.startswith("--procs="):
                n = int(a.split("=", 1)[1])
            if a.startswith("--mode="):
                mode = a.split("=", 1)[1]
        sys.exit(main(n, mode))
