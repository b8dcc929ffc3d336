import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import sys; sys.path.insert(0,'/root/repo')
import minnow_tpu as minnow
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
print("backend:", jax.default_backend(), flush=True)

from minnow_tpu.core import spec
from minnow_tpu.parallel import BlockEncoder

rng = np.random.default_rng(0)
B, N = 24, 4096
low, high, dx = 0.0, 250.0, 0.001
pixels = spec.float_group_pixels(low, high, dx)
# mixed data: clustered (small widths) + spread (18 bits) + constant
x = np.empty((B, N), np.float32)
x[:8] = ((rng.uniform(-2, 2, (8, N)) + 250) % 250)
x[8:16] = rng.uniform(0, 249.9, (8, N))
x[16:] = 123.456
be = BlockEncoder()
enc = be.encode_float_blocks(x, low, high, pixels)
ok = True
for i in range(B):
    payload, mn, bits, _ = spec.encode_float_block(x[i], low, high, pixels)
    if enc.payloads[i] != payload or enc.mins[i] != mn or enc.bits[i] != bits:
        ok = False; print("MISMATCH block", i, flush=True)
print("float blocks byte-identical on TPU:", ok, "widths:", sorted(set(enc.bits.tolist())), flush=True)

xi = rng.integers(0, 10**12, (12, 2048), dtype=np.int64)
xi[3] = 42
enc2 = be.encode_int_blocks(xi)
ok2 = all(enc2.payloads[i] == spec.encode_int_block(xi[i])[0] for i in range(12))
print("int blocks byte-identical on TPU:", ok2, flush=True)

dec = be.decode_float_blocks(enc.payloads, enc.mins, enc.bits, low, high, pixels, N, dither="none")
host = np.stack([spec.dequantize(spec.bound(spec.decode_int_block(enc.payloads[i], int(enc.mins[i]), int(enc.bits[i]), N), 0, pixels), low, high, pixels) for i in range(B)])
print("decode bit-identical to host:", np.array_equal(dec, host), flush=True)
print("TPU PIPELINE CHECK OK" if (ok and ok2) else "FAILED", flush=True)
