"""Sharded block encode/decode pipeline.

The distributed generalization of the reference's sequential writer loop
(ref go/minh/minh.go:99-139 + go/bit/bit.go): minnow blocks are
data-parallel (each carries its own min/bits metadata,
ref go/group.go:242-263), so the pipeline

  1. shards the block axis of a (B, N) batch across the mesh and runs the
     fused quantize/recenter/delta/stats program (ops/codec.py) -- one jit,
     XLA inserts any needed collectives;
  2. resolves the data-dependent pack width per block on host (exact
     ``precision_needed``), bucketing blocks by width;
  3. packs each bucket with the width-specialized word-parallel kernel
     (ops/bitpack.py), still sharded;
  4. computes writer-order byte offsets as an exclusive prefix-sum of the
     block sizes (the distributed analog of blockIndex.addBlock,
     ref go/block_index.go:16-23) and assembles exact reference bytes.

Blocks whose pixels fall outside [0, P) (possible only through the raw
float API) are re-encoded on host with the normative greedy scan --
the device one-pass reduction flags them via ``valid``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np

from ..core import spec
from ..ops import bitpack, codec
from . import mesh as mesh_lib

__all__ = ["EncodedBlocks", "BlockEncoder"]


@dataclass
class EncodedBlocks:
    """Result of encoding a batch of blocks: per-block packed payloads and
    tail metadata, plus writer-order offsets."""

    payloads: list  # list[bytes], one per block
    mins: np.ndarray  # (B,) int64
    bits: np.ndarray  # (B,) int64
    lens: np.ndarray  # (B,) int64 valid lengths

    @property
    def sizes(self) -> np.ndarray:
        return np.array([len(p) for p in self.payloads], dtype=np.int64)

    @property
    def offsets(self) -> np.ndarray:
        """Exclusive prefix-sum: byte offset of each block within the
        group's data region (ref go/block_index.go)."""
        sizes = self.sizes
        out = np.zeros_like(sizes)
        np.cumsum(sizes[:-1], out=out[1:])
        return out

    def total_bytes(self) -> int:
        return int(self.sizes.sum())

    def write_to(self, writer) -> None:
        """Append all blocks to the current group of a core Writer via the
        pre-encoded fast path."""
        for payload, mn, bits in zip(self.payloads, self.mins, self.bits):
            writer.data_encoded(payload, int(mn), int(bits))


class BlockEncoder:
    """Device-sharded encoder/decoder for batches of minnow blocks.

    ``pallas`` selects the fused single-HBM-pass encode kernel
    (ops/pallas_encode.py) for float blocks: ``"auto"`` (default) uses
    it on the TPU backend when the shape qualifies and the mesh is
    unset, ``True``/``False`` force it.  The env var
    ``MINNOW_TPU_PALLAS_ENCODE=0|1`` overrides ``"auto"``.  Bytes are
    identical either way: the kernel packs at the column's predicted
    width and every block it cannot certify (or whose true width
    differs) is re-encoded through the XLA/host path."""

    def __init__(self, mesh=None, pallas="auto"):
        # Bounded backend wait: through a half-dead TPU tunnel, backend
        # init hangs forever with no exception to catch; fail fast with
        # a clear error instead so callers can take the host codec path
        # (the --device CLIs downgrade via device_or_host before ever
        # constructing one of these).
        from ..utils import backend_guard

        if backend_guard.probe() is None:
            raise backend_guard.BackendUnavailableError(
                "JAX backend init did not complete within the probe "
                "timeout; use the host codec path or raise "
                "MINNOW_TPU_BACKEND_PROBE_TIMEOUT")
        backend_guard.ensure_compile_cache()
        self.mesh = mesh
        self.pallas = pallas

    def _pallas_mode(self) -> bool:
        if self.pallas is False:
            return False
        if self.pallas is True:
            return True
        import os

        env = os.environ.get("MINNOW_TPU_PALLAS_ENCODE", "")
        if env == "0":
            return False
        if env == "1":
            return True
        import jax

        return jax.default_backend() == "tpu"

    # -- helpers -----------------------------------------------------------

    def _shard(self, *arrays):
        """Place batch arrays with the block axis sharded over the mesh."""
        if self.mesh is None:
            return arrays
        out = []
        for a in arrays:
            sh = mesh_lib.block_sharding(self.mesh, np.ndim(a))
            out.append(jax.device_put(a, sh))
        return tuple(out)

    def _pad(self, b: int) -> int:
        if self.mesh is None:
            return b
        d = self.mesh.devices.size
        return b + ((-b) % d)

    @staticmethod
    def _as_batch(x, lens):
        x = np.asarray(x)
        b, n = x.shape
        if lens is None:
            lens = np.full(b, n, dtype=np.int64)
        else:
            lens = np.asarray(lens, dtype=np.int64)
        return x, b, n, lens

    @staticmethod
    def _bucket_loop(rows_all, bits, lens, pack_rows) -> list:
        """Shared width-bucketing: group rows by width, call
        ``pack_rows(rows, idx, width) -> (B_idx, W) words`` per bucket,
        and slice each row's payload bytes.  Device rows stay on device
        between the stats pass and the width-specialized pack (only the
        packed words -- the compressed bytes -- ever cross to host)."""
        b = rows_all.shape[0]
        payloads: list = [b""] * b
        for width in np.unique(bits):
            width = int(width)
            if width == 0:
                continue
            idx = np.nonzero(bits == width)[0]
            rows = rows_all[idx] if len(idx) < b else rows_all
            words = np.asarray(pack_rows(rows, idx, width))
            for row, block_id in enumerate(idx):
                payloads[block_id] = bitpack.words_to_bytes(
                    words[row], width, int(lens[block_id]))
        return payloads

    def _bucket_pack(self, deltas, bits, lens) -> list:
        """Pack rows of materialized ``deltas`` grouped by width
        (the float encode prep's tail)."""
        return self._bucket_loop(
            deltas, bits, lens,
            lambda rows, idx, width: bitpack.pack_batch(rows, width))

    def _bucket_pack_ints(self, x, mins, bits, lens) -> list:
        """Width-bucketed fused delta+pack for int blocks: the second
        dispatch of the two-pass int encode reads ``x`` + per-block
        mins and emits words directly (no materialized deltas).  On TPU
        the planar pack runs in the group-aligned Pallas kernel
        (ops/pallas_encode.pack_int_pallas_group) -- the XLA pack's
        64-bit shift/OR emulation is the ID-column bottleneck
        (ref go/group.go:242-255)."""
        mins64 = np.asarray(mins, np.int64)
        lens64 = np.asarray(lens, np.int64)

        def pack_rows(rows, idx, width):
            pal = self._pallas_pack_ints(rows, mins64[idx],
                                         lens64[idx], width)
            if pal is not None:
                return pal
            return bitpack.delta_pack_batch(rows, mins64[idx],
                                            lens64[idx], width)
        return self._bucket_loop(x, bits, lens, pack_rows)

    def _pallas_pack_ints(self, rows, mins, lens, width):
        """Group-aligned Pallas delta+pack for one int width bucket, or
        None when the shape/backend doesn't qualify (caller packs via
        XLA; bytes identical either way).  Under a mesh the kernel runs
        per-device inside shard_map over the block axis (pallas_call
        does not auto-shard), like the float encode kernel."""
        if not self._pallas_mode():
            return None
        from ..ops import pallas_encode, selfcheck

        n = int(rows.shape[1])
        from ..ops.pallas_codec import group_tiles

        align = 32 * group_tiles(width) * 8
        n_pad = -(-n // align) * align
        # same padding-waste bound as the decode fast path: reject
        # blocks below the alignment or just past a boundary
        if n_pad * 4 > n * 5 or not pallas_encode.supported_pack_int(
                width, n_pad):
            return None
        import jax

        interpret = jax.default_backend() != "tpu"
        if not selfcheck.kernel_ok("encode", interpret=interpret):
            return None

        def call(rows, mins, lens):
            return pallas_encode.delta_pack_int_pallas(
                rows, mins, lens, width, n, n_pad,
                interpret=interpret)

        if self.mesh is None:
            return call(rows, mins, lens)
        from jax.sharding import PartitionSpec as P

        b = rows.shape[0]
        bp = self._pad(b)
        if bp != b:
            import jax.numpy as jnp

            # jnp.pad keeps device-resident rows on device (np.pad
            # would round-trip the whole int64 batch through host)
            rows = jnp.pad(rows, [(0, bp - b), (0, 0)])
            mins = np.pad(mins, (0, bp - b))
            lens = np.pad(lens, (0, bp - b))
        row = P(mesh_lib.BLOCK_AXIS)
        mat = P(mesh_lib.BLOCK_AXIS, None)
        fn = jax.shard_map(call, mesh=self.mesh,
                           in_specs=(mat, row, row), out_specs=mat,
                           check_vma=False)
        return fn(*self._shard(rows, mins, lens))[:b]

    # -- encode ------------------------------------------------------------

    def encode_int_blocks(self, x, lens=None) -> EncodedBlocks:
        """Encode (B, N) int64 blocks (ref go/group.go:242-255).

        Two-pass: a fused stats-only read (codec.int_block_stats), then
        a width-bucketed fused delta+pack straight from ``x``
        (bitpack.delta_pack_batch) -- the u64 deltas never round-trip
        through HBM, and widths <= 32 pack in native u32."""
        x, b, n, lens = self._as_batch(x, lens)
        bp = self._pad(b)
        if bp != b:
            x = np.pad(x, [(0, bp - b), (0, 0)])
            lens_p = np.pad(lens, (0, bp - b), constant_values=1)
        else:
            lens_p = lens
        (x_d, lens_d) = self._shard(x, lens_p)
        mins_d, maxd = codec.int_block_stats(x_d, lens_d)
        x_d = x_d[:b]  # stays on device for the pack dispatches
        mins = np.asarray(mins_d)[:b].copy()
        maxd = np.asarray(maxd)[:b]
        mins[lens == 0] = 0  # empty block: min is 0 (ref go/group.go:244)
        bits = np.array([spec.precision_needed(int(m)) for m in maxd],
                        dtype=np.int64)
        payloads = self._bucket_pack_ints(x_d, mins, bits, lens)
        return EncodedBlocks(payloads, mins, bits, lens)

    def encode_float_blocks(self, x, low, high, pixels, lens=None,
                            periodic=True,
                            clamp_q: bool = False) -> EncodedBlocks:
        """Encode (B, N) float32 blocks (ref go/group.go:312-327).

        ``low``/``high``/``pixels``/``periodic`` may be scalars or (B,)
        arrays (per-block quantization configs are broadcast with the
        data, matching the multi-column minh layout)."""
        x, b, n, lens = self._as_batch(x, lens)
        low = np.broadcast_to(np.asarray(low, np.float32), (b,)).copy()
        high = np.broadcast_to(np.asarray(high, np.float32), (b,)).copy()
        pixels = np.broadcast_to(np.asarray(pixels, np.int64), (b,)).copy()
        periodic = np.broadcast_to(np.asarray(periodic, bool), (b,)).copy()
        if b and self._pallas_mode():
            out = self._encode_float_pallas(x, b, n, low, high, pixels,
                                            lens, periodic, clamp_q)
            if out is not None:
                return out
        return self._encode_float_xla(x, b, n, low, high, pixels, lens,
                                      periodic, clamp_q)

    def _encode_float_pallas(self, x, b, n, low, high, pixels, lens,
                             periodic, clamp_q):
        """Fused-kernel float encode: one HBM pass for every block the
        kernel certifies at the predicted width; the rest re-encode via
        the XLA/host path.  Returns None when the shape/config does not
        qualify (caller falls back wholesale)."""
        from ..ops import fastdiv, pallas_encode

        if n == 0:
            return None
        preds = {spec.precision_needed(int(p) - 1)
                 for p in np.unique(pixels) if p > 0}
        if len(preds) != 1:
            return None  # mixed predicted widths: no single static pack
        bits_pred = preds.pop()
        pix_max = int(pixels.max())
        # prefer the group-aligned kernel (dense 128-multiple HBM refs;
        # 64.8 GB/s slope at 1024->4096 blocks of 2^17 on v5e --
        # earlier 57/250 GB/s readings at smaller sizes were dispatch-
        # floor artifacts, tools/group_encode.log); fall back per-tile,
        # then XLA
        use_group = pallas_encode.supported_group_enc(bits_pred, n,
                                                      pix_max)
        # above the fused kernel's 512k block cap: two-dispatch encode
        # (fused XLA stats + stateless pack kernel)
        use_big = (not use_group
                   and pallas_encode.supported_pack_enc(bits_pred, n,
                                                        pix_max))
        if not (use_group or use_big) and \
                not pallas_encode.supported(bits_pred, n, pix_max):
            return None
        import jax

        interpret = jax.default_backend() != "tpu"

        # one-shot per-process kernel certification (ops/selfcheck):
        # a Mosaic regression must degrade to the XLA path, not corrupt
        # written bytes for users who never ran bench's validation
        from ..ops import selfcheck

        if not selfcheck.kernel_ok("encode", interpret=interpret):
            return None

        dxq = (np.float32(high - low)
               / pixels.astype(np.float32)).astype(np.float32)
        db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)

        # column-constant specialization (opt-in until certified on
        # chip, MINNOW_TPU_PALLAS_CONST=1): when every block shares the
        # column's quantization scalars -- the universal minh-column
        # case -- bake them into the compiled kernel (bytes identical;
        # validate_pallas_group gates const==generic on the backend)
        const_cfg = None
        if use_group and os.environ.get(
                "MINNOW_TPU_PALLAS_CONST", "0") == "1":
            uniform = all(
                bool((np.asarray(a)[:1] == np.asarray(a)).all())
                for a in (low, db, deb, dm0, dm1, pixels, periodic))
            if uniform:
                const_cfg = pallas_encode.make_const_cfg(
                    low, db, deb, dm0, dm1, pixels, periodic)

        def kernel_call(x, low, db, deb, dm0, dm1, pix, per):
            if use_group or use_big:
                from ..ops.pallas_codec import group_tiles

                g = group_tiles(bits_pred)
                t = n // 32
                bloc = x.shape[0]
                if use_group:
                    w2, mins, maxd, valid = \
                        pallas_encode.encode_float_pallas_group(
                            x[:, :n].reshape(bloc * (t // g), g * 32),
                            low, db, deb, dm0, dm1, pix, per,
                            bits_pred, n, interpret=interpret,
                            const_cfg=const_cfg)
                else:
                    w2, mins, maxd, valid = \
                        pallas_encode.encode_float_pallas_bigblock(
                            x[:, :n].reshape(bloc * (t // g), g * 32),
                            low, db, deb, dm0, dm1, pix, per,
                            bits_pred, n, interpret=interpret)
                return (w2.reshape(bloc, t * bits_pred), mins, maxd,
                        valid)
            return pallas_encode.encode_float_pallas(
                x, low, db, deb, dm0, dm1, pix, per, bits_pred, n,
                interpret=interpret)
        args = (x, low, db, deb, dm0, dm1, pixels, periodic)
        if self.mesh is not None:
            # mesh path: pallas_call does not auto-shard, so the kernel
            # runs per-device under shard_map over the block axis (the
            # XLA path's auto-spmd equivalent); each device encodes its
            # local blocks, outputs re-concatenate on the same axis
            from jax.sharding import PartitionSpec as P

            bp = self._pad(b)
            if bp != b:
                pad = bp - b
                args = tuple(
                    np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                           mode="edge")
                    for a in args)
            row = P(mesh_lib.BLOCK_AXIS)
            mat = P(mesh_lib.BLOCK_AXIS, None)
            fn = jax.shard_map(
                kernel_call,
                mesh=self.mesh, in_specs=(mat,) + (row,) * 7,
                out_specs=(mat, row, row, row),
                # pallas_call's out_shape carries no varying-mesh-axes
                # metadata; the kernel is per-block so every output
                # varies only on the block axis
                check_vma=False)
            words, mins, maxd, valid = (o[:b] for o in
                                        fn(*self._shard(*args)))
        else:
            words, mins, maxd, valid = kernel_call(*args)
        words = np.asarray(words)
        mins = np.asarray(mins).astype(np.int64)
        maxd = np.asarray(maxd).astype(np.int64)
        bits_true = np.array([spec.precision_needed(int(m)) for m in maxd],
                             dtype=np.int64)
        # clamp_q changes quantized values only for out-of-range pixels,
        # which the kernel flags invalid anyway; certified rows are
        # unaffected by it
        ok = (np.asarray(valid) & dok & (lens == n)
              & (bits_true == bits_pred))
        payloads: list = [b""] * b
        for i in np.nonzero(ok)[0]:
            payloads[i] = bitpack.words_to_bytes(words[i], bits_pred, n)
        bits = np.full(b, bits_pred, dtype=np.int64)
        if not ok.all():
            bad = np.nonzero(~ok)[0]
            sub = self._encode_float_xla(
                x[bad], len(bad), n, low[bad], high[bad], pixels[bad],
                lens[bad], periodic[bad], clamp_q)
            for row, i in enumerate(bad):
                payloads[i] = sub.payloads[row]
                mins[i] = sub.mins[row]
                bits[i] = sub.bits[row]
        return EncodedBlocks(payloads, mins, bits, lens)

    def _encode_float_xla(self, x, b, n, low, high, pixels, lens,
                          periodic, clamp_q) -> EncodedBlocks:
        bp = self._pad(b)
        if bp != b:
            pad = bp - b
            x = np.pad(x, [(0, pad), (0, 0)])
            low = np.pad(low, (0, pad))
            high = np.pad(high, (0, pad), constant_values=1)
            pixels = np.pad(pixels, (0, pad), constant_values=1)
            periodic = np.pad(periodic, (0, pad))
            lens_p = np.pad(lens, (0, pad), constant_values=1)
        else:
            lens_p = lens

        # host: per-block pixel width + divisor magic for the
        # integer-exact fast quantize (ops/fastdiv.py)
        from ..ops import fastdiv

        with np.errstate(all="ignore"):
            dxq = (np.float32(high - low)
                   / pixels.astype(np.float32)).astype(np.float32)
        db, deb, dm0, dm1, dok = fastdiv.divisor_magic(dxq)

        sharded = self._shard(x, low, periodic, db, deb, dm0, dm1)
        (x_d, low_d, per_d, db_d, deb_d, dm0_d, dm1_d) = sharded
        (pix_d, lens_d) = self._shard(pixels, lens_p)
        # all-native-width graph when every pixel count fits 29 bits
        # (int32 arithmetic + uint32 deltas; no 64-bit emulation)
        prep = codec.prepare_float_blocks_fast32 \
            if int(pixels.max()) < (1 << 29) \
            else codec.prepare_float_blocks_fast
        deltas, mins, maxd, valid = prep(
            x_d, low_d, pix_d, lens_d, per_d, db_d, deb_d, dm0_d, dm1_d,
            clamp_q=clamp_q)
        deltas = deltas[:b]  # stays on device
        mins = np.asarray(mins)[:b].astype(np.int64)
        maxd = np.asarray(maxd)[:b].astype(np.uint64)
        mins[lens == 0] = 0  # empty block: min is 0 (ref go/group.go:244)
        valid = np.asarray(valid)[:b] & dok[:b]

        if not valid.all():
            # Rare fallback: out-of-range pixels -> normative host greedy
            # scan (raw float API only; minh/minp data is always in range).
            deltas = np.asarray(deltas).copy()
            for i in np.nonzero(~valid)[0]:
                payload, mn, bits_i, q = spec.encode_float_block(
                    x[i, :lens[i]], low[i], high[i], int(pixels[i]),
                    periodic=bool(periodic[i]), clamp_q=clamp_q)
                mn64 = np.int64(mn)
                d = np.zeros(n, np.uint64)
                d[:lens[i]] = (q - mn64).view(np.uint64)
                deltas[i] = d
                mins[i] = mn64
                maxd[i] = d.max() if lens[i] else 0

        bits = np.array([spec.precision_needed(int(m)) for m in maxd],
                        dtype=np.int64)
        payloads = self._bucket_pack(deltas, bits, lens)
        return EncodedBlocks(payloads, mins, bits, lens)

    # -- decode ------------------------------------------------------------

    def _shard_rows(self, *arrays):
        """Pad the leading (block) axis of a decode bucket to the mesh
        size and shard it; returns (padded+sharded arrays, valid rows).
        Off-mesh this is the identity (decode buckets are elementwise
        per block, so XLA auto-SPMD handles the sharded batch with no
        program changes -- the read mirror of the encode sharding,
        ref go/reader.go:114-127)."""
        b = arrays[0].shape[0]
        if self.mesh is None:
            return arrays, b
        bp = self._pad(b)
        if bp != b:
            arrays = tuple(
                np.pad(a, [(0, bp - b)] + [(0, 0)] * (a.ndim - 1))
                for a in arrays)
        return self._shard(*arrays), b

    def decode_int_blocks(self, payloads, mins, bits, n: int) -> np.ndarray:
        """Decode per-block payloads back to (B, n) int64."""
        b = len(payloads)
        mins = np.asarray(mins, np.int64)
        bits = np.asarray(bits, np.int64)
        out = np.empty((b, n), dtype=np.int64)
        for width in np.unique(bits):
            width = int(width)
            idx = np.nonzero(bits == width)[0]
            if width == 0:
                out[idx] = mins[idx, None]
                continue
            w = bitpack.words_per_block(width, n)
            words = np.zeros((len(idx), w), dtype=np.uint32)
            for row, block_id in enumerate(idx):
                words[row] = bitpack.bytes_to_words(
                    payloads[block_id], width, n)
            (words_d, mins_d), nb = self._shard_rows(words, mins[idx])
            dec = np.asarray(codec.decode_int_blocks(
                words_d, mins_d, width, n))[:nb]
            out[idx] = dec
        return out

    def decode_float_blocks(self, payloads, mins, bits, low, high, pixels,
                            n: int, periodic=True, dither: str = "none",
                            seed: int = 0, block_ids=None) -> np.ndarray:
        """Decode per-block payloads back to (B, n) float32
        (ref go/group.go:299-310)."""
        b = len(payloads)
        mins = np.asarray(mins, np.int64)
        bits = np.asarray(bits, np.int64)
        low = np.broadcast_to(np.asarray(low, np.float32), (b,))
        high = np.broadcast_to(np.asarray(high, np.float32), (b,))
        pixels = np.broadcast_to(np.asarray(pixels, np.int64), (b,))
        periodic = np.broadcast_to(np.asarray(periodic, bool), (b,))
        if block_ids is None:
            block_ids = np.arange(b, dtype=np.int64)
        block_ids = np.asarray(block_ids, np.int64)

        out = np.empty((b, n), dtype=np.float32)
        for width in np.unique(bits):
            width = int(width)
            idx = np.nonzero(bits == width)[0]
            w = max(bitpack.words_per_block(width, n), 1)
            words = np.zeros((len(idx), w), dtype=np.uint32)
            if width:
                for row, block_id in enumerate(idx):
                    words[row] = bitpack.bytes_to_words(
                        payloads[block_id], width, n)
            sharded, nb = self._shard_rows(
                words, mins[idx], low[idx], high[idx], pixels[idx],
                periodic[idx], block_ids[idx])
            (words_d, mins_d, low_d, high_d, pix_d, per_d, bid_d) = \
                sharded
            dec = np.asarray(codec.decode_float_blocks(
                words_d, mins_d, low_d, high_d, pix_d, per_d, bid_d,
                width, n, dither=dither, seed=seed))[:nb]
            out[idx] = dec
        return out
