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
    local = all_x[process_id * 4:(process_id + 1) * 4]  # process-major

    enc = BlockEncoder().encode_int_blocks(local)
    full = gather_blocks(enc)

    if process_id == 0:
        with open(out_file, "wb") as f:
            pickle.dump({
                "payloads": full.payloads,
                "mins": np.asarray(full.mins),
                "bits": np.asarray(full.bits),
                "lens": np.asarray(full.lens),
                "all_x": all_x,
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
    from minnow_tpu.core import spec

    with open(out_file, "rb") as f:
        got = pickle.load(f)
    all_x = got["all_x"]
    assert len(got["payloads"]) == 8
    for i in range(8):
        payload, mn, bits = spec.encode_int_block(all_x[i])
        assert got["payloads"][i] == payload, i
        assert got["mins"][i] == mn and got["bits"][i] == bits, i
    print("multiprocess gather OK: 8 blocks, process-major order, "
          "byte-identical to single-process encode")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5])
    else:
        sys.exit(main())
