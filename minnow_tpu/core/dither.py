"""Deterministic counter-based read dither.

The reference dequantizes with a uniform in-pixel dither: Go uses the
global unseeded RNG (irreproducible across runs, ref go/group.go:308);
the reference Python reader seeds ``random.seed(b)`` per block
(ref python/minnow.py:175).  This framework defines the dither as
counter-based and keyed on ``(seed, block_id)``:

* host reads use numpy's Philox generator (pure numpy -- opening a file
  never initializes an accelerator runtime),
* device-side batched decode uses the keyed counter hash
  ``ops/codec.dither_hash_u`` (per-block keys from full jax-threefry
  ``fold_in``; per-element mixing via the lowbias32 avalanche hash) --
  cheap enough to run fused inside the Pallas decode kernel, identical
  between the XLA and kernel paths,
* ``none`` (u=0) and ``midpoint`` (u=0.5) modes are bit-identical across
  host and device and are used for strict cross-checking.

Both streams are deterministic; the decoded-value contract in all modes is
``|x - x_hat| <= dx`` (ref go/minnow_test.go:328-334).
"""

from __future__ import annotations

import numpy as np

UNIFORM = "uniform"
NONE = "none"
MIDPOINT = "midpoint"


def dither_u(mode: str, seed: int, block: int, n: int):
    """Per-element dither offsets u in [0, 1) added to pixel indices before
    scaling (ref go/group.go:308 semantics)."""
    if mode == NONE:
        return None
    if mode == MIDPOINT:
        return np.full(n, 0.5)
    if mode == UNIFORM:
        rng = np.random.Generator(
            np.random.Philox(key=(np.uint64(seed) << np.uint64(32))
                             ^ np.uint64(block)))
        return rng.random(n)
    raise ValueError("unknown dither mode %r" % mode)
