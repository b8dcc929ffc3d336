import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(3)
T = 2
bits_in = rng.integers(0, 2, (32, T)).astype(np.uint32)

def chain_or(b):
    acc = jnp.zeros((T,), jnp.uint32)
    for j in range(32):
        acc = acc | (b[j] << np.uint32(j))
    return acc

def stack_sum(b):
    shifts = jnp.arange(32, dtype=jnp.uint32)[:, None]
    return jnp.sum(b << shifts, axis=0, dtype=jnp.uint32)

def chain_add(b):
    acc = jnp.zeros((T,), jnp.uint32)
    for j in range(32):
        acc = acc + (b[j] << np.uint32(j))
    return acc

want = np.zeros(T, np.uint64)
for j in range(32):
    want |= bits_in[j].astype(np.uint64) << np.uint64(j)
print("want:", [hex(v) for v in want], flush=True)
for name, f in [("chain_or", chain_or), ("stack_sum", stack_sum), ("chain_add", chain_add)]:
    got = np.asarray(jax.jit(f)(bits_in))
    print(name, [hex(v) for v in got], "OK" if np.array_equal(got.astype(np.uint64), want) else "MISMATCH", flush=True)
