"""Experimental Pallas pack kernel (8 minnow blocks per grid step).

The production pack path is the XLA formulation in ops/bitpack.py, which
is already VPU-compute-bound at full lane occupancy; this kernel is the
Pallas expression of the same tile math (per-row vector shifts + slice
sums over VMEM-resident data), kept as the starting point for a future
fully-fused single-kernel encode (see docs/STATUS.md roadmap).

Byte-identical to spec.pack_bits for widths 1-32 in interpreter mode
(tests/test_pallas_pack.py).  Hardware lowering on this image's Mosaic
is blocked by three limitations found while porting (2026-08-17):

* ``jnp.mod`` recurses infinitely during kernel tracing (worked around
  with ``& 31``);
* reductions over unsigned integers are unimplemented (worked around by
  bitcasting to int32 -- addition is bitwise identical);
* in-kernel 3-D reshape ``(8, t*32) -> (8, t, 32)`` fails
  ``infer-vector-layout: unsupported shape cast`` -- fixing it requires
  restructuring to purely 2-D references (pre-transposed inputs), at
  which point the kernel reproduces exactly what XLA already emits.

Hence the XLA formulation remains the production path this round;
tools/tpu_pipeline_check.py proves its byte-identity on hardware.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import bitpack

__all__ = ["pack_batch_pallas"]

_TILE = 32


_ROWS = 8  # blocks per grid step (Mosaic sublane alignment)


def _kernel(bits: int, t: int, x_ref, out_ref):
    """Pack 8 blocks: x_ref (8, t*32) uint32 -> out_ref (8, t*bits)."""
    x = x_ref[...].reshape(_ROWS, t, _TILE).transpose(0, 2, 1)
    lo_mask, _ = bitpack._masks(bits)
    # shift vectors built in-kernel (pallas kernels cannot capture
    # array constants); the word-range bounds below stay host-static
    j = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, 1), 1)
    offs = j * bits
    # & 31 instead of % 32: jnp.mod recurses during Mosaic kernel tracing
    s = (offs & 31).astype(jnp.uint32)
    w = (np.arange(_TILE, dtype=np.int64) * bits) // 32
    xm = x & lo_mask
    part_lo = xm << s
    s2 = ((jnp.uint32(32) - s) & jnp.uint32(31)).astype(jnp.uint32)
    part_sp = jnp.where(s > 0, xm >> s2, jnp.uint32(0))

    # Mosaic lacks unsigned reductions; int32 addition is bitwise
    # identical, so sum through a bitcast
    bc = jax.lax.bitcast_convert_type
    part_lo = bc(part_lo, jnp.int32)
    part_sp = bc(part_sp, jnp.int32)

    rows = []
    for word in range(bits):
        acc = None
        for part, idx in ((part_lo, w), (part_sp, w + 1)):
            j0 = int(np.searchsorted(idx, word, side="left"))
            j1 = int(np.searchsorted(idx, word, side="right"))
            if j1 > j0:
                seg = part[:, j0:j1].sum(axis=1, dtype=jnp.int32)
                acc = seg if acc is None else acc + seg
        rows.append(acc if acc is not None
                    else jnp.zeros((_ROWS, t), jnp.int32))
    words = bc(jnp.stack(rows, axis=1), jnp.uint32)  # (8, bits, t)
    out_ref[...] = words.transpose(0, 2, 1).reshape(_ROWS, t * bits)


@partial(jax.jit, static_argnames=("bits", "interpret"))
def pack_batch_pallas(x, bits: int, interpret: bool = False):
    """(B, N) uint32 -> (B, words_per_block) uint32 via a Pallas kernel,
    one block per grid step.  Requires bits in [1, 32] and N % 32 == 0."""
    from jax.experimental import pallas as pl

    if not 1 <= bits <= 32:
        raise ValueError("pallas pack supports widths 1-32")
    b, n = x.shape
    if n % _TILE:
        raise ValueError("N must be a multiple of 32")
    if b % _ROWS:
        raise ValueError("B must be a multiple of 8")
    t = n // _TILE
    if (t * bits) % 128:
        raise ValueError("t*bits must be lane-aligned (128)")
    kernel = partial(_kernel, bits, t)
    out = pl.pallas_call(
        kernel,
        grid=(b // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROWS, t * bits), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t * bits), jnp.uint32),
        interpret=interpret,
    )(x.astype(jnp.uint32))
    return out[:, : bitpack.words_per_block(bits, n)]
