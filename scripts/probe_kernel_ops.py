"""Probe Mosaic lowering support for the planned BVH kernel patterns:
  A) dynamic single-lane slice of a (BR, C) VMEM scratch: scr[:, pl.ds(c, 1)]
  B) scalar read with dynamic lane index from a (1, C) VMEM scratch
  C) per-iteration cost of the gated loop (any() + pl.when) per cluster
Run on the real TPU: python scripts/probe_kernel_ops.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR, C = 512, 128


def kernel_a(x, out, scr):
    scr[...] = x[...]

    def body(c, acc):
        m = scr[:, pl.ds(c, 1)]          # dynamic lane slice width 1
        return acc + jnp.sum(m)

    total = jax.lax.fori_loop(0, C, body, jnp.float32(0.0))
    out[...] = jnp.full(out.shape, total, jnp.float32)


def kernel_b(x, out, scr):
    scr[...] = jnp.sum(x[...], axis=0, keepdims=True)

    def body(c, acc):
        s = scr[0, c]                     # scalar read, dynamic lane index
        return acc + s

    total = jax.lax.fori_loop(0, C, body, jnp.float32(0.0))
    out[...] = jnp.full(out.shape, total, jnp.float32)


def kernel_c(x, out, scr):
    # gated loop: any() reduction + pl.when per cluster, nothing inside
    scr[...] = x[...]
    out[...] = jnp.zeros(out.shape, jnp.float32)

    def body(c, _):
        m = scr[:, pl.ds(c, 1)]
        @pl.when(jnp.any(m > 2.0))        # never true for our input
        def _():
            out[...] = out[...] + m
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def run(kernel, name, scr_shape):
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((BR, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM(scr_shape, jnp.float32)],
    )
    x = jnp.ones((BR, C), jnp.float32)
    try:
        jf = jax.jit(lambda x: f(x))
        r = jax.block_until_ready(jf(x))
        t0 = time.perf_counter()
        for _ in range(100):
            r = jf(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 100
        print(f"{name}: OK  value[0,0]={float(r[0,0]):.1f}  {dt*1e6:.1f} us/call"
              f"  ({dt*1e6/C:.2f} us/iter)")
    except Exception as e:
        print(f"{name}: FAIL  {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print(jax.devices())
    run(kernel_a, "A dyn-lane-slice", (BR, C))
    run(kernel_b, "B scalar-vmem-read", (1, C))
    run(kernel_c, "C gated-loop-cost", (BR, C))
