"""Device mesh helpers.

The reference's only parallel runtime is a goroutine worker pool
(ref go/thread/thread.go); the TPU framework's unit of parallelism is the
independently-coded minnow *block* (ref go/group.go:242-263 -- every block
carries its own min/bits metadata), sharded across a 1-D ``blocks`` mesh
axis.  On a multi-host slice the axis spans all chips; XLA inserts the
collectives (size all-gather, offset prefix-sum) where the program needs
globals.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def block_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis ``blocks``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (block) axis, replicate the rest."""
    return NamedSharding(mesh, P(BLOCK_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, multiple: int, axis: int = 0, fill=0):
    """Pad the block axis so it divides the mesh size evenly."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill), n
