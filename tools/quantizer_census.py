"""VPU op census of the limb quantizer (VERDICT r5 #2: pin the encode
speed-of-light arithmetic instead of asserting it).

Traces ops/pallas_encode._quantize_limb (slim and full) plus the planar
pack tile on a vector block and counts the PER-ELEMENT vector ops by
jaxpr census: an eqn counts iff any operand or output is a full-rank
vector (scalar-scalar arithmetic is free -- it runs once per block, not
per element).  Multiplies are counted separately: on the VPU a u32
multiply costs ~2-4 issue slots vs 1 for add/shift/compare/select.

Usage: python tools/quantizer_census.py   (CPU, no TPU needed)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


_FREE = {"reshape", "squeeze", "broadcast_in_dim", "convert_element_type",
         "bitcast_convert_type", "stop_gradient", "slice", "concatenate",
         "transpose"}
# conversions/bitcasts are register re-types on the VPU; layout ops are
# counted by the kernel's structure share, not the quantizer's.

_MUL = {"mul"}


def _regs(v):
    """(8, 128)-register count of a value (0 for scalars/1-D)."""
    aval = getattr(v, "aval", None)
    shape = getattr(aval, "shape", ())
    if len(shape) < 2:
        return 0
    rows = int(np.prod(shape[:-1]))
    lanes = shape[-1]
    return max(1, -(-rows // 8)) * max(1, -(-lanes // 128))


def _walk(jaxpr, acc):
    for eqn in jaxpr.eqns:
        # inline nested jaxprs (jit/pjit/custom calls): their eqns are
        # the real per-element work
        sub = eqn.params.get("jaxpr", None) or eqn.params.get(
            "call_jaxpr", None)
        if sub is not None:
            _walk(getattr(sub, "jaxpr", sub), acc)
            continue
        if eqn.primitive.name in _FREE:
            continue
        r = max([_regs(v) for v in list(eqn.invars)
                 + list(eqn.outvars)] + [0])
        if r == 0:
            continue  # scalar-only: once per block, not per element
        acc["slots"] += r
        acc["ops"] += 1
        acc["by"][eqn.primitive.name] = acc["by"].get(
            eqn.primitive.name, 0) + 1
        if eqn.primitive.name in _MUL:
            acc["mul_slots"] += r
    return acc


def census(fn, *args, label="", elems=None):
    """Count VPU register-issue slots: every eqn is weighted by how
    many native (8, 128) registers its widest operand spans (one VPU
    instruction retires one register per issue).  Returns
    (slots_per_elem_x1024, mul_slots_per_elem_x1024) normalized so a
    single full-register op on (8, 128) inputs counts 1."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    acc = _walk(jaxpr.jaxpr, {"slots": 0, "mul_slots": 0, "ops": 0,
                              "by": {}})
    if elems is None:
        elems = int(np.prod(np.asarray(args[0]).shape))
    spe = acc["slots"] * 1024.0 / elems       # slots per 1024 elems
    mpe = acc["mul_slots"] * 1024.0 / elems
    print("%-28s %6.1f reg-slots/1024elem (%5.1f of them u32 mul; "
          "%d eqns)" % (label, spe, mpe, acc["ops"]))
    for k in sorted(acc["by"], key=acc["by"].get, reverse=True):
        print("    %-22s %d" % (k, acc["by"][k]))
    return spe, mpe


def main():
    from minnow_tpu.ops import pallas_encode

    x = np.linspace(0.01, 240.0, 8 * 128, dtype=np.float32)
    x = x.reshape(8, 128)
    b = np.uint32(0x8637BD)   # representative 24-bit divisor mantissa
    eb = np.int32(-10)
    m0 = np.uint32(0xF4898D5F)
    m1 = np.uint32(0x1E891)

    o_slim, m_slim = census(
        lambda d: pallas_encode._quantize_limb(d, b, eb, m0, m1,
                                               slim=True),
        x, label="quantize_limb slim")
    o_full, m_full = census(
        lambda d: pallas_encode._quantize_limb(d, b, eb, m0, m1,
                                               slim=False),
        x, label="quantize_limb full")

    q = (x * 100).astype(np.int32)
    bits = 18
    o_pack, m_pack = census(
        lambda t: pallas_encode._pack_tile_planar(
            jax.lax.bitcast_convert_type(t, np.uint32)[:32], bits),
        np.tile(q, (4, 1))[:32], label="pack tile planar (18b)",
        elems=32 * 128)

    # Speed-of-light model (TPU v5e): the VPU retires ~4 single-slot
    # (8, 128)-register vector instructions per ~0.94 GHz cycle =>
    # ~3.76e9 register-ops/s, 1024 elements per register.  u32 multiply
    # decomposes to ~2 extra slots on this unit (no native 32x32
    # vector multiplier); conversions/selects modeled at 1.
    reg_rate = 0.94e9 * 4
    for mul_extra in (1.0, 3.0):
        def light(spe, mpe):
            slots = spe + mul_extra * mpe
            return 4.0 / (slots / 1024.0 / reg_rate) / 1e9

        print("\n[mul = %d slots]" % (1 + mul_extra))
        lq = light(o_slim, m_slim)
        lp = light(o_pack, m_pack)
        print("  quantizer alone : %6.0f GB/s" % lq)
        print("  pack alone      : %6.0f GB/s" % lp)
        print("  quantizer+pack  : %6.0f GB/s"
              % (1.0 / (1.0 / lq + 1.0 / lp)))


if __name__ == "__main__":
    main()
