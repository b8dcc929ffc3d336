import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np, jax.numpy as jnp
import bench
from minnow_tpu.ops import pallas_codec
np.asarray((jnp.ones((8,128))+1)[0,:1]); print("up", flush=True)
# every even width (G=64) at t_g=1024: does r=256 compile + run?
for bits in (2, 4, 8, 10, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32):
    g = pallas_codec.group_tiles(bits)
    if g != 64:
        continue
    n = 32 * g * 1024          # t_g = 1024
    b = 2
    t_g = 1024
    try:
        w = bench._dev_words((b * t_g, g * bits), bits)
        mins = np.zeros(b, np.int64)
        lo = np.zeros(b, np.float32); hi = np.full(b, 250.0, np.float32)
        pix = np.full(b, min((1 << bits) - 1, (1 << 24) - 1), np.int64)
        per = np.ones(b, bool)
        out = pallas_codec.decode_float_pallas_group(
            w, mins, lo, hi, pix, per, bits, n, dither="none")
        np.asarray(out[:1, 0])
        print("bits=%2d t_g=1024 r=256: OK" % bits, flush=True)
        del w, out
    except Exception as e:
        print("bits=%2d FAILED: %s" % (bits, str(e)[:110]), flush=True)
