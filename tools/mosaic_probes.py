"""Mosaic capability probes for the fused Pallas codec kernels.

Each probe is a tiny pallas_call compiled and run on the real chip,
selected by argv so one failure/stall cannot wedge the rest (drive with
a per-run timeout).  Results inform the fused encode/decode kernel
design (docs/STATUS.md roadmap):

* transpose  -- 2-D int32 VMEM transpose (512, 32) -> (32, 512)
* u64mul     -- uint64 multiply in-kernel (needed to port the fastdiv
                magic product as-is; else 16-bit-limb rewrite)
* reshape2d  -- 2-D lane-regrouping reshape (512, 32) -> (128, 128)
* sliceconcat-- build (32, R) from 32 static row slices of (18, R)

Usage: python tools/mosaic_probes.py <name>
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import minnow_tpu.ops  # noqa: F401 - x64 on

    return jax


def probe_transpose():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = np.arange(512 * 32, dtype=np.int32).reshape(512, 32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 512), jnp.int32),
    )(x)
    ok = bool((np.asarray(out) == x.T).all())
    return {"ok": ok}


def probe_u64mul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] * b_ref[...]

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 62, (8, 128), dtype=np.uint64)
    b = rng.integers(0, 1 << 62, (8, 128), dtype=np.uint64)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint64),
    )(a, b)
    ok = bool((np.asarray(out) == a * b).all())
    return {"ok": ok}


def probe_reshape2d():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(128, 128)

    x = np.arange(512 * 32, dtype=np.int32).reshape(512, 32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
    )(x)
    ok = bool((np.asarray(out) == x.reshape(128, 128)).all())
    return {"ok": ok}


def probe_sliceconcat():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    bits, r = 18, 512
    offs = np.arange(32, dtype=np.int64) * bits
    w1 = np.minimum(offs // 32, bits - 1)

    def kernel(x_ref, o_ref):
        x = x_ref[...]  # (18, R)
        rows = [x[int(w):int(w) + 1, :] for w in w1]
        o_ref[...] = jnp.concatenate(rows, axis=0)  # (32, R)

    x = np.arange(bits * r, dtype=np.int32).reshape(bits, r)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, r), jnp.int32),
    )(x)
    ok = bool((np.asarray(out) == x[w1]).all())
    return {"ok": ok}


def probe_stride_read():
    """Strided sublane slice x[w::18] on a (1152, 256) array -- the
    per-word extraction a transpose-free grouped decode kernel needs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[3::18, :]

    x = np.arange(1152 * 256, dtype=np.int32).reshape(1152, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
    )(x)
    ok = bool((np.asarray(out) == x[3::18]).all())
    return {"ok": ok}


def probe_stride_write():
    """Strided sublane store o[j::32] = v -- the interleaving store the
    same kernel needs for k-major element order."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[5::32, :] = x_ref[...]
        o_ref[0::32, :] = x_ref[...] + jnp.int32(1)

    x = np.arange(64 * 256, dtype=np.int32).reshape(64, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2048, 256), jnp.int32),
    )(x)
    o = np.asarray(out)
    ok = bool((o[5::32] == x).all() and (o[0::32] == x + 1).all())
    return {"ok": ok}


def probe_big_transpose():
    """In-kernel transpose at decode-kernel scale: (256, 1152) ->
    (1152, 256) int32 (the supported case was (512, 32))."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = np.arange(256 * 1152, dtype=np.int32).reshape(256, 1152)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1152, 256), jnp.int32),
    )(x)
    ok = bool((np.asarray(out) == x.T).all())
    return {"ok": ok}


PROBES = {
    "stride_read": probe_stride_read,
    "stride_write": probe_stride_write,
    "big_transpose": probe_big_transpose,
    "transpose": probe_transpose,
    "u64mul": probe_u64mul,
    "reshape2d": probe_reshape2d,
    "sliceconcat": probe_sliceconcat,
}


def main():
    name = sys.argv[1]
    _setup()
    import jax

    try:
        out = PROBES[name]()
    except Exception as e:  # noqa: BLE001 - the probe IS the question
        out = {"ok": False, "error": str(e)[:400]}
    out.update({"probe": name, "device": str(jax.devices()[0])})
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
