"""Pallas pack kernel == spec bytes (interpreter mode on the CPU mesh;
the hardware path is exercised by tools/)."""

import numpy as np
import pytest

from minnow_tpu.core import spec
from minnow_tpu.ops import bitpack, pallas_pack


@pytest.mark.parametrize("bits", [16, 18, 32])  # t*bits lane-aligned
def test_pallas_pack_matches_spec(bits):
    rng = np.random.default_rng(bits)
    b, n = 8, 2048  # t=64 keeps t*bits lane-aligned
    x = rng.integers(0, 2**32, (b, n), dtype=np.int64).astype(np.uint32)
    words = np.asarray(pallas_pack.pack_batch_pallas(
        x, bits, interpret=True))
    for i in range(b):
        want = spec.pack_bits(x[i].astype(np.uint64), bits)
        got = bitpack.words_to_bytes(words[i], bits, n)
        assert got == want, (bits, i)


def test_pallas_pack_validates_args():
    x = np.zeros((8, 33), np.uint32)
    with pytest.raises(ValueError, match="multiple of 32"):
        pallas_pack.pack_batch_pallas(x, 8, interpret=True)
    with pytest.raises(ValueError, match="widths 1-32"):
        pallas_pack.pack_batch_pallas(np.zeros((8, 32), np.uint32), 40,
                                      interpret=True)
    with pytest.raises(ValueError, match="multiple of 8"):
        pallas_pack.pack_batch_pallas(np.zeros((3, 256), np.uint32), 16,
                                      interpret=True)
