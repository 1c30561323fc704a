#!/usr/bin/env python
"""Microbenchmark: ways to do a 2M-ray bilinear equirect sample on TPU.

Variants:
  A. jnp advanced-index gather (current implementation)
  B. jnp.take along flattened table
  C. one-hot factored matmul: rows one-hot (R,H) @ img (H, W*3), then
     per-ray column mix — fused via jit, blocked by XLA
  D. variant C but with the 4-tap bilinear folded into the one-hots
     (two-hot row/col weight vectors), bf16 matmul
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 2_073_600
H, W = 256, 512


def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3), np.float32))
    u = jnp.asarray(rng.random(R, np.float32))
    v = jnp.asarray(rng.random(R, np.float32))

    def taps(u, v):
        fx = u * W - 0.5
        fy = v * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = fx - x0
        ay = fy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
        return x0i, x1i, y0i, y1i, ax, ay

    @jax.jit
    def variant_a(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        flat = img.reshape(-1, 3)
        def g(yi, xi):
            return flat[yi * W + xi]
        top = g(y0i, x0i) * (1 - ax)[:, None] + g(y0i, x1i) * ax[:, None]
        bot = g(y1i, x0i) * (1 - ax)[:, None] + g(y1i, x1i) * ax[:, None]
        return top * (1 - ay)[:, None] + bot * ay[:, None]

    @jax.jit
    def variant_b(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        flat = img.reshape(-1, 3)
        def g(yi, xi):
            return jnp.take(flat, yi * W + xi, axis=0, unique_indices=False,
                            indices_are_sorted=False)
        top = g(y0i, x0i) * (1 - ax)[:, None] + g(y0i, x1i) * ax[:, None]
        bot = g(y1i, x0i) * (1 - ax)[:, None] + g(y1i, x1i) * ax[:, None]
        return top * (1 - ay)[:, None] + bot * ay[:, None]

    def twohot(i0, i1, a, n):
        # (R, n) weights with (1-a) at i0 and a at i1
        iota = jnp.arange(n, dtype=jnp.int32)[None, :]
        return (jnp.where(iota == i0[:, None], (1 - a)[:, None], 0.0)
                + jnp.where(iota == i1[:, None], a[:, None], 0.0))

    @jax.jit
    def variant_c(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        wv = twohot(y0i, y1i, ay, H)                      # (R, H)
        wu = twohot(x0i, x1i, ax, W)                      # (R, W)
        tmp = jnp.dot(wv, img.reshape(H, W * 3),
                      preferred_element_type=jnp.float32)  # (R, W*3)
        tmp = tmp.reshape(-1, W, 3)
        return jnp.einsum('rwc,rw->rc', tmp, wu)

    @jax.jit
    def variant_d(u, v):
        x0i, x1i, y0i, y1i, ax, ay = taps(u, v)
        wv = twohot(y0i, y1i, ay, H).astype(jnp.bfloat16)
        wu = twohot(x0i, x1i, ax, W)
        tmp = jnp.dot(wv, img.reshape(H, W * 3).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        tmp = tmp.reshape(-1, W, 3)
        return jnp.einsum('rwc,rw->rc', tmp, wu)

    timeit("A: advanced index", variant_a, u, v)
    timeit("B: jnp.take", variant_b, u, v)
    timeit("C: two-hot matmul f32", variant_c, u, v)
    timeit("D: two-hot matmul bf16", variant_d, u, v)

    # agreement check
    a = variant_a(u[:4096], v[:4096])
    c = variant_c(u[:4096], v[:4096])
    d = variant_d(u[:4096], v[:4096])
    print("C vs A max err:", float(jnp.abs(c - a).max()))
    print("D vs A max err:", float(jnp.abs(d - a).max()))


if __name__ == "__main__":
    main()
