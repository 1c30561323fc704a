import time, jax, jax.numpy as jnp, numpy as np
R = 2_073_600
def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")

rng = np.random.default_rng(0)
for T in [64, 1280, 8192, 65536]:
    tbl = jnp.asarray(rng.random((T,), np.float32))
    tbl18 = jnp.asarray(rng.random((T, 18), np.float32))
    idx = jnp.asarray(rng.integers(0, T, R).astype(np.int32))
    timeit(f"T={T} 1x scalar gather", jax.jit(lambda i: tbl[i]), idx)
    timeit(f"T={T} 18-col row gather", jax.jit(lambda i: tbl18[i]), idx)
