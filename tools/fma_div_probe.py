"""On-chip probe: is Markstein division exact under Mosaic FMA contraction?

The fused encode kernel's limb quantizer costs ~50 vector ops/elem
(tools/encode_attrib.py: 51% of kernel time).  If Mosaic contracts
``a*b + c`` into a true single-rounded f32 FMA (the decode kernel must
actively BLOCK this contraction for parity, ops/pallas_codec.py:154,
so it plainly fires), then the classic Markstein finish from a
host-computed correctly-rounded reciprocal y = RN(1/b) is ~4 ops:

    q0 = a * y                  # RN
    r  = a - b*q0               # contracts to fma(-b, q0, a): EXACT
    q  = q0 + r*y               # contracts to fma(r, y, q0): RN(a/b)

Markstein's round-to-nearest theorem guarantees q == RN(a/b) for all
normal operands when both contractions are real FMAs.  This probe
measures that bitwise on the chip against numpy's (hardware, correctly
rounded) f32 division over adversarial inputs:

* random   -- wide random exponents/mantissas
* tie      -- quotients constructed to land at f32 rounding midpoints
               (where a fake fma or a 2-ulp divide misrounds)
* exact    -- exactly representable quotients (r == 0 path)
* nearint  -- quotients within 1 ulp of integers (floor boundaries)

Also probes the same sequence in plain XLA jit on TPU (would let the
XLA two-pass encode drop its f64-emulated division), and an unfused
host emulation as a discriminator (it MUST fail on ties; if it didn't,
the tie generator would be too weak to conclude anything).

Usage: python tools/fma_div_probe.py <pallas|xla> [n_batches]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import minnow_tpu.ops  # noqa: F401 - x64 on

    return jax


F32 = np.float32
ROWS, LANES = 4096, 128
N = ROWS * LANES


def _rand_f32(rng, n, emin, emax, signed=True):
    """Random normal f32 with exponent uniform in [emin, emax]."""
    m = rng.integers(0, 1 << 23, n, dtype=np.uint32)
    e = rng.integers(emin + 127, emax + 127 + 1, n, dtype=np.uint32)
    s = (rng.integers(0, 2, n, dtype=np.uint32) << np.uint32(31)
         if signed else np.zeros(n, np.uint32))
    return ((s | (e << np.uint32(23)) | m)).view(np.float32)


def gen_random(rng):
    a = _rand_f32(rng, N, -60, 60)
    b = _rand_f32(rng, N, -40, 40, signed=False)
    return a, b


def gen_tie(rng):
    """a/b lands (up to a's final rounding) on an f32 tie midpoint."""
    b = _rand_f32(rng, N, -30, 30, signed=False)
    q = _rand_f32(rng, N, -20, 20)
    qn = np.nextafter(q, np.float32(np.inf))
    qm = (q.astype(np.float64) + qn.astype(np.float64)) * 0.5
    a = (b.astype(np.float64) * qm).astype(np.float32)
    return a, b


def gen_exact(rng):
    """b*q exact in f32 -> quotient exactly representable, r == 0."""
    b12 = (_rand_f32(rng, N, -20, 20, signed=False).view(np.uint32)
           & np.uint32(0xFFFFF800)).view(np.float32)  # 12-bit mantissa
    q = rng.integers(1, 1 << 11, N).astype(np.float32)
    q *= np.where(rng.integers(0, 2, N) == 0, F32(-1), F32(1))
    a = b12 * q
    return a, b12


def gen_nearint(rng):
    """Quotients within ~1 ulp of integers (floor-boundary stress)."""
    b = _rand_f32(rng, N, -25, 25, signed=False)
    k = rng.integers(1, 1 << 22, N).astype(np.float64)
    eps = (rng.integers(-2, 3, N)).astype(np.float64) * 2.0**-24
    qm = k * (1.0 + eps)
    sign = np.where(rng.integers(0, 2, N) == 0, -1.0, 1.0)
    a = (b.astype(np.float64) * qm * sign).astype(np.float32)
    return a, b


GENS = {"random": gen_random, "tie": gen_tie, "exact": gen_exact,
        "nearint": gen_nearint}


def _mask_safe(a, ref):
    """Elements inside the range the kernel would certify."""
    aa, ar = np.abs(a), np.abs(ref)
    ok_a = (a == 0) | ((aa >= 2.0**-90) & (aa <= 2.0**90))
    ok_r = (ref == 0) | ((ar >= 2.0**-90) & (ar <= 2.0**90))
    return ok_a & ok_r & np.isfinite(ref) & np.isfinite(a)


def _host_unfused(a, b, y):
    """Separately rounded f32 sequence (what a non-contracting backend
    would compute) -- the discriminator."""
    with np.errstate(all="ignore"):
        q0 = a * y
        r = (a - (b * q0).astype(np.float32)).astype(np.float32)
        return (q0 + (r * y).astype(np.float32)).astype(np.float32)


def _run(kind: str, batches: int):
    jax = _setup()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def seq(a, b, y):
        q0 = a * y
        r = a - b * q0
        return q0 + r * y

    if kind == "pallas":
        def kernel(a_ref, b_ref, y_ref, o_ref):
            o_ref[...] = seq(a_ref[...], b_ref[...], y_ref[...])

        call = jax.jit(lambda a, b, y: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        )(a, b, y))
    else:
        call = jax.jit(seq)

    out = {"kind": kind,
           "device": str(jax.devices()[0].device_kind)}
    for name, gen in GENS.items():
        rng = np.random.default_rng(hash(name) % 2**31)
        mism = total = disc = 0
        ex = None
        for i in range(batches):
            a, b = gen(rng)
            with np.errstate(all="ignore"):
                y = (F32(1.0) / b).astype(np.float32)
                ref = (a / b).astype(np.float32)
            m = _mask_safe(a, ref)
            got = np.asarray(call(a.reshape(ROWS, LANES),
                                  b.reshape(ROWS, LANES),
                                  y.reshape(ROWS, LANES))).reshape(-1)
            bad = m & (got.view(np.uint32) != ref.view(np.uint32))
            total += int(m.sum())
            mism += int(bad.sum())
            disc += int((m & (_host_unfused(a, b, y).view(np.uint32)
                              != ref.view(np.uint32))).sum())
            if bad.any() and ex is None:
                j = int(np.argmax(bad))
                ex = {"a": hex(a.view(np.uint32)[j]),
                      "b": hex(b.view(np.uint32)[j]),
                      "got": hex(got.view(np.uint32)[j]),
                      "ref": hex(ref.view(np.uint32)[j])}
        out[name] = {"n": total, "mismatch": mism,
                     "unfused_would_miss": disc}
        if ex:
            out[name]["example"] = ex
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    _run(kind, batches)
