"""ctypes bindings for the native host engine (native/fastbits.cpp).

Builds the shared library on first use if missing (g++; see
native/Makefile).  All entry points have pure-numpy fallbacks in
core/spec.py, so the package works without a compiler -- the native path
is the performance engine for host-side packing and text parsing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .core import spec

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libfastbits.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    lib.mnw_pack.argtypes = [ctypes.c_void_p, i64, ctypes.c_int,
                             ctypes.c_void_p, ctypes.c_int]
    lib.mnw_unpack.argtypes = [ctypes.c_void_p, i64, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_int]
    lib.mnw_periodic_min.argtypes = [ctypes.c_void_p, i64, i64]
    lib.mnw_periodic_min.restype = i64
    lib.mnw_bound.argtypes = [ctypes.c_void_p, i64, i64, i64]
    lib.mnw_quantize.argtypes = [ctypes.c_void_p, i64, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_void_p]
    lib.mnw_delta_stats.argtypes = [ctypes.c_void_p, i64, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_void_p]
    lib.mnw_parse_columns.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, i64,
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_int, ctypes.c_char]
    lib.mnw_parse_columns.restype = i64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_bits(x, bits: int, threads: int = 1) -> bytes:
    """Native fixed-width pack; byte-identical to spec.pack_bits."""
    lib = _load()
    x = np.ascontiguousarray(np.asarray(x).view(np.uint64).ravel())
    n = x.shape[0]
    if lib is None:
        return spec.pack_bits(x, bits)
    if bits == 0 or n == 0:
        return b""
    nbytes = spec.array_bytes(bits, n)
    out = np.zeros(nbytes + 16, dtype=np.uint8)
    lib.mnw_pack(x.ctypes.data, n, bits, out.ctypes.data,
                 threads or os.cpu_count())  # 0 = all cores
    return out[:nbytes].tobytes()


def unpack_bits(data: bytes, bits: int, n: int,
                threads: int = 1) -> np.ndarray:
    """Native unpack; equals spec.unpack_bits."""
    lib = _load()
    if lib is None:
        return spec.unpack_bits(data, bits, n)
    out = np.empty(n, dtype=np.uint64)
    if bits == 0 or n == 0:
        out[:] = 0
        return out
    need = spec.array_bytes(bits, n)
    buf = np.zeros(need + 16, dtype=np.uint8)
    buf[:need] = np.frombuffer(data[:need], dtype=np.uint8)
    lib.mnw_unpack(buf.ctypes.data, n, bits, out.ctypes.data,
                   threads or os.cpu_count())
    return out


def periodic_min(x, pixels: int) -> int:
    """Native greedy periodic window scan; equals spec.periodic_min."""
    lib = _load()
    x = np.ascontiguousarray(np.asarray(x, dtype=np.int64))
    if lib is None:
        return spec.periodic_min(x, pixels)
    return int(lib.mnw_periodic_min(x.ctypes.data, x.shape[0], pixels))


def parse_columns(buf: bytes, line_starts, line_ends, col_idx,
                  threads: int = 0, sep: bytes = b" "):
    """Parse the given column indices of every line into float64 arrays.
    Returns a list of arrays, or raises ValueError naming the bad line.
    The native equivalent of the reference's threaded parse loops
    (ref go/text/parse.go:80-174)."""
    lib = _load()
    line_starts = np.ascontiguousarray(line_starts, dtype=np.int64)
    line_ends = np.ascontiguousarray(line_ends, dtype=np.int64)
    col_idx = np.ascontiguousarray(col_idx, dtype=np.int64)
    n_lines = line_starts.shape[0]
    outs = [np.empty(n_lines, dtype=np.float64) for _ in col_idx]
    if lib is None:
        return _parse_columns_py(buf, line_starts, line_ends, col_idx, outs)
    ptrs = (ctypes.c_void_p * len(outs))(
        *[o.ctypes.data for o in outs])
    res = lib.mnw_parse_columns(
        buf, line_starts.ctypes.data, line_ends.ctypes.data, n_lines,
        col_idx.ctypes.data, len(col_idx), ptrs,
        threads or os.cpu_count(), sep)
    if res != 0:
        raise ValueError("cannot parse requested columns on line %d"
                         % (res - 1))
    return outs


def _parse_columns_py(buf, line_starts, line_ends, col_idx, outs):
    for li in range(line_starts.shape[0]):
        fields = buf[line_starts[li]:line_ends[li]].split()
        for c, ci in enumerate(col_idx):
            if ci >= len(fields):
                raise ValueError(
                    "cannot parse requested columns on line %d" % li)
            outs[c][li] = float(fields[ci])
    return outs
