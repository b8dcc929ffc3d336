"""Multi-host coordination: ordered gather of encoded blocks to one file.

The distributed generalization of the reference's single-process writer
(ref go/writer.go): every host encodes its local shard of blocks with the
device pipeline, per-block byte sizes are all-gathered, writer-order
offsets are the exclusive prefix sum over the *global* block order (the
distributed blockIndex, ref go/block_index.go:16-23), and process 0
writes one byte-exact file.

Single-process (incl. the virtual CPU mesh) is the degenerate case and
shares all code paths except the cross-process allgather.

On a real multi-host slice, call ``jax.distributed.initialize()`` first
(``init_distributed`` wraps it); block batches are expected to be
process-sharded in process-major global order.
"""

from __future__ import annotations

import numpy as np

from .pipeline import EncodedBlocks

__all__ = ["init_distributed", "gather_blocks", "is_coordinator"]


def init_distributed(**kw) -> None:
    """Initialize multi-host JAX (no-op when single-process)."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kw)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0


def gather_blocks(enc: EncodedBlocks) -> EncodedBlocks:
    """All-gather per-host encoded blocks into the global writer order
    (process-major).  Returns the full EncodedBlocks on every process;
    typically only process 0 then writes.

    Payload bytes are exchanged as a zero-padded uint8 matrix (ragged
    rows padded to the global max block size) plus exact sizes -- the
    variable-length analog of the reference's fixed per-block writes.
    """
    import jax

    if jax.process_count() == 1:
        return enc

    from jax.experimental import multihost_utils as mhu

    sizes = enc.sizes
    b_local = len(enc.payloads)
    max_size = int(mhu.process_allgather(
        np.asarray([sizes.max() if b_local else 0])).max())

    buf = np.zeros((b_local, max_size), dtype=np.uint8)
    for i, p in enumerate(enc.payloads):
        buf[i, :len(p)] = np.frombuffer(p, dtype=np.uint8)

    meta = np.stack([sizes, enc.mins.view(np.int64), enc.bits,
                     enc.lens]).astype(np.int64)

    all_buf = mhu.process_allgather(buf)      # (P, B_local, max) or ragged
    all_meta = mhu.process_allgather(meta)    # (P, 4, B_local)

    all_buf = all_buf.reshape(-1, max_size)
    all_meta = np.concatenate([m for m in all_meta], axis=1)
    g_sizes, g_mins, g_bits, g_lens = all_meta

    payloads = [all_buf[i, :g_sizes[i]].tobytes()
                for i in range(all_buf.shape[0])]
    return EncodedBlocks(payloads, g_mins, g_bits, g_lens)
