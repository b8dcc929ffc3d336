"""Two-process validation of parallel/distributed.gather_blocks.

Runs the same encode on two JAX processes (CPU backend, local
coordinator) and checks that the gathered blocks on process 0 equal a
single-process encode of the concatenated data -- the ordered multi-host
gather contract (process-major writer order).

Usage (the test suite drives this; manual run):
  python tools/multiprocess_gather_check.py
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile


def worker(process_id: int, num: int, port: int, out_file: str) -> None:
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
    from minnow_tpu.parallel import BlockEncoder
    from minnow_tpu.parallel.distributed import gather_blocks

    rng = np.random.default_rng(7)
    all_x = rng.integers(-(2**40), 2**40, (8, 64), dtype=np.int64)
    all_f = rng.uniform(0, 99.9, (8, 64)).astype(np.float32)
    local = slice(process_id * 4, (process_id + 1) * 4)  # process-major

    be = BlockEncoder()
    enc_i = gather_blocks(be.encode_int_blocks(all_x[local]))
    from minnow_tpu.core import spec

    pixels = spec.float_group_pixels(0.0, 100.0, 0.01)
    enc_f = gather_blocks(be.encode_float_blocks(
        all_f[local], 0.0, 100.0, pixels))

    if process_id == 0:
        # coordinator writes ONE file from the gathered blocks --
        # the BASELINE "ordered gather to one bit-exact file" config
        import minnow_tpu as minnow

        mp_file = out_file + ".minnow"
        w = minnow.create(mp_file)
        w.int_group(64)
        enc_i.write_to(w)
        w.float_group(64, (0.0, 100.0), 0.01)
        enc_f.write_to(w)
        w.close()
        with open(out_file, "wb") as f:
            pickle.dump({
                "payloads": enc_i.payloads,
                "mins": np.asarray(enc_i.mins),
                "bits": np.asarray(enc_i.bits),
                "all_x": all_x,
                "all_f": all_f,
                "mp_file": mp_file,
            }, f)


def main() -> int:
    port = 52123
    out_file = tempfile.mktemp(suffix=".pkl")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(i), "2", str(port), out_file], env=env)
        for i in range(2)
    ]
    for p in procs:
        if p.wait(timeout=120) != 0:
            print("worker failed")
            return 1

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import minnow_tpu as minnow
    from minnow_tpu.core import spec

    with open(out_file, "rb") as f:
        got = pickle.load(f)
    all_x = got["all_x"]
    assert len(got["payloads"]) == 8
    for i in range(8):
        payload, mn, bits = spec.encode_int_block(all_x[i])
        assert got["payloads"][i] == payload, i
        assert got["mins"][i] == mn and got["bits"][i] == bits, i

    # the coordinator-written file must be byte-identical to a pure
    # single-process host write of the full dataset
    ref_file = out_file + ".ref.minnow"
    w = minnow.create(ref_file)
    w.int_group(64)
    for row in all_x:
        w.data(row)
    w.float_group(64, (0.0, 100.0), 0.01)
    for row in got["all_f"]:
        w.data(row)
    w.close()
    mp_bytes = open(got["mp_file"], "rb").read()
    ref_bytes = open(ref_file, "rb").read()
    assert mp_bytes == ref_bytes, "multiprocess file differs from host"
    print("multiprocess gather OK: 16 blocks across int+float groups, "
          "coordinator-written file byte-identical to a single-process "
          "host write (%d bytes)" % len(mp_bytes))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5])
    else:
        sys.exit(main())
