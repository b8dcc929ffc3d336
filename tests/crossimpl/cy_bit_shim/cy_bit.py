"""Pure-Python stand-in for the reference's compiled ``cy_bit`` extension.

The image has no Cython, so the *untouched* reference Python stack
(``/root/reference/python/{minnow,minh,bit}.py``) is executed in a
subprocess with this module on ``sys.path`` in place of the compiled
``cy_bit`` module (ref python/setup.py builds it from cy_bit.pyx).

Every function here is a literal loop-for-loop transcription of
``/root/reference/python/cy_bit.pyx`` (including uint8 wraparound on
shifts and the C integer-division semantics of ``pixels/2``).  Nothing
from ``minnow_tpu`` is imported: the cross-implementation tests in
``tests/test_crossimpl.py`` therefore exercise the reference's own
container/compression logic end to end against this repo's writer and
reader.
"""

import numpy as np


def precision_needed(max):
    # ref python/cy_bit.pyx:6-7
    return int(np.ceil(np.log2(max + 1)))


def array_bytes(bits, length):
    # ref python/cy_bit.pyx:9-10
    return int(np.ceil(float(bits * length) / 8))


def array(bits, x):
    # ref python/cy_bit.pyx:12-48 (uint8 stores truncate shifts mod 256)
    bits = int(bits)
    x = np.asarray(x, dtype=np.uint64)
    b = np.zeros(array_bytes(bits, len(x)), dtype=np.uint8)
    buf = [0] * 8
    t_buf = [0] * 9

    buf_bytes = bits // 8
    if buf_bytes * 8 < bits:
        buf_bytes += 1

    for i in range(len(x)):
        xi = int(x[i])
        curr_bit = (i * bits) % 8

        for j in range(buf_bytes):
            buf[j] = (xi >> (8 * j)) & 0xFF

        t_buf[buf_bytes] = 0
        for j in range(buf_bytes):
            t_buf[j] = (buf[j] << curr_bit) & 0xFF
        for j in range(buf_bytes):
            # curr_bit == 0: uint8 >> 8 is 0 in C and in Python alike.
            t_buf[j + 1] |= buf[j] >> (8 - curr_bit)

        start_byte = (i * bits) // 8
        end_byte = ((i + 1) * bits - 1) // 8
        for j in range(end_byte - start_byte + 1):
            b[start_byte + j] |= t_buf[j]

    return np.array(b)


def from_array(arr, bits, length):
    # ref python/cy_bit.pyx:50-98
    arr = np.asarray(arr, dtype=np.uint8)
    bits = int(bits)
    length = int(length)
    out = np.zeros(length, dtype=np.uint64)
    buf = [0] * 8
    t_buf = [0] * 9

    buf_bytes = bits // 8
    if buf_bytes * 8 < bits:
        buf_bytes += 1

    for i in range(length):
        start_bit = (i * bits) % 8
        next_start_bit = (start_bit + bits) % 8

        start_byte = (i * bits) // 8
        end_byte = ((i + 1) * bits - 1) // 8
        t_buf_bytes = end_byte - start_byte + 1

        for j in range(t_buf_bytes):
            t_buf[j] = int(arr[start_byte + j])

        start_mask = (0xFF << start_bit) & 0xFF
        end_mask = (0xFF >> ((8 - next_start_bit) & 0xFF)) & 0xFF
        if next_start_bit == 0:
            end_mask = 0xFF

        t_buf[0] &= start_mask
        t_buf[t_buf_bytes - 1] &= end_mask

        for j in range(buf_bytes):
            buf[j] = t_buf[j] >> start_bit
        for j in range(buf_bytes):
            # start_bit == 0: uint8 store truncates (t << 8) & 0xff to 0.
            buf[j] |= (t_buf[j + 1] << (8 - start_bit)) & 0xFF

        for j in range(t_buf_bytes):
            t_buf[j] = 0

        xi = 0
        for j in range(buf_bytes):
            xi |= buf[j] << (8 * j)
        out[i] = xi

    return np.array(out)


def _periodic_distance(x, x0, pixels):
    # ref python/cy_bit.pyx:128-137
    d = x - x0
    if d >= 0:
        if d > pixels - d:
            return d - pixels
    else:
        if d < -(d + pixels):
            return pixels + d
    return d


def periodic_min(x, pixels):
    # ref python/cy_bit.pyx:100-126 (cdivision: pixels/2 truncates)
    x = np.asarray(x, dtype=np.int64)
    pixels = int(pixels)
    x0 = int(x[0])
    width = 1
    n = len(x)

    for i in range(n):
        xi = int(x[i])
        x1 = x0 + width - 1
        if x1 >= pixels:
            x1 -= pixels

        d0 = _periodic_distance(xi, x0, pixels)
        d1 = _periodic_distance(xi, x1, pixels)

        if d0 > 0 and d1 < 0:
            continue

        if d1 > -d0:
            width += d1
        else:
            x0 += d0
            if x0 < 0:
                x0 += pixels
            width -= d0

        if width > pixels // 2:
            return 0

    return x0
