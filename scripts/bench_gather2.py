import time
import jax
import jax.numpy as jnp
import numpy as np

R = 2_073_600

def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")

def make(H, W, precision):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3), np.float32))
    u = jnp.asarray(rng.random(R, np.float32))
    v = jnp.asarray(rng.random(R, np.float32))

    def taps(u, v):
        fx = u * W - 0.5; fy = v * H - 0.5
        x0 = jnp.floor(fx); y0 = jnp.floor(fy)
        ax = fx - x0; ay = fy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
        return x0i, x1i, y0i, y1i, ax, ay

    def twohot(i0, i1, a, n):
        iota = jnp.arange(n, dtype=jnp.int32)[None, :]
        return (jnp.where(iota == i0[:, None], (1 - a)[:, None], 0.0)
                + jnp.where(iota == i1[:, None], a[:, None], 0.0))

    @jax.jit
    def full(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        wv = twohot(y0i, y1i, ay, H)
        wu = twohot(x0i, x1i, ax, W)
        tmp = jnp.dot(wv, img.reshape(H, W * 3), precision=precision)
        tmp = tmp.reshape(-1, W, 3)
        return jnp.einsum('rwc,rw->rc', tmp, wu, precision=precision)

    @jax.jit
    def mm_only(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        wv = twohot(y0i, y1i, ay, H)
        return jnp.dot(wv, img.reshape(H, W * 3), precision=precision).sum(axis=1)

    @jax.jit
    def onehot_only(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        wv = twohot(y0i, y1i, ay, H)
        wu = twohot(x0i, x1i, ax, W)
        return wv.sum(axis=1) + wu.sum(axis=1)
    return full, mm_only, onehot_only, u, v

for H, W in [(256,512),(128,256),(64,128)]:
    for prec in ['default','highest']:
        full, mm, oh, u, v = make(H, W, prec)
        timeit(f"{H}x{W} {prec} full", full, u, v)
        if prec=='default':
            timeit(f"{H}x{W} mm_only", mm, u, v)
            timeit(f"{H}x{W} onehot_only", oh, u, v)
