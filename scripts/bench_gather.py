"""Microbenchmark: dynamic row-gather strategies for the skybox sampler.

The quad-packed sampler costs one (N, 4)-u32 row gather per miss ray;
profile_sky.py measured it at ~10.5 ms for N = 2M on v5e — ~5 ns/row,
i.e. scalar-issue bound, not bandwidth bound (32 MB at HBM speed would
be ~0.04 ms).  This script measures every plausible lever on real
hardware so the sampler design is driven by data:

  - row width (u32 x 1/2/4/8): is the cost per-row or per-byte?
  - sorted vs random indices: does XLA's gather exploit locality?
  - 2D (row, col) two-step forms
  - the windowed two-hot MXU sampler on block-coherent indices (the
    form a Pallas per-tile sampler would use): cost if ALL blocks were
    coherent.

Usage: python scripts/bench_gather.py [N]   (run on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1920 * 1080
H, W = 1024, 2048


def t(f, *args, iters=20):
    r = jax.block_until_ready(f(*args))
    # One device->host readback flips the axon tunnel into its
    # synchronous (honest) mode for the rest of the process: before the
    # FIRST d2h transfer, block_until_ready returns without waiting for
    # real execution, so readback-free loops time nothing (measured: a
    # 2048^3 f32 matmul "takes" 0.02 ms = 770 TFLOP/s on a v5e).  In
    # honest mode each dispatch costs ~0.9 ms (the floor printed below);
    # timings here block once at the end, so per-iter cost ~= device
    # time + ~0.9 ms dispatch.
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    # dispatch-floor reference: an empty-ish op, same readback pattern
    z = jnp.float32(1.0)
    floor = t(jax.jit(lambda x: x + 1.0), z)
    print(f"dispatch+readback floor: {floor:7.2f} ms", flush=True)
    idx_np = rng.integers(0, H * W, N, dtype=np.int64).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))

    for width in (1, 2, 4, 8):
        tab = jnp.asarray(
            rng.integers(0, 2**32, (H * W, width), dtype=np.uint64)
            .astype(np.uint32))
        g = jax.jit(lambda tb, i: jnp.sum(tb[i]))
        ms = t(g, tab, idx)
        ms_s = t(g, tab, idx_sorted)
        print(f"rows (N,{width})u32: random {ms:7.2f} ms   "
              f"sorted {ms_s:7.2f} ms", flush=True)

    # 1D flat gather of u32 scalars (width 0 case)
    tab1 = jnp.asarray(rng.integers(0, 2**32, H * W, dtype=np.uint64)
                       .astype(np.uint32))
    g1 = jax.jit(lambda tb, i: jnp.sum(tb[i]))
    print(f"flat (N,)u32:       random {t(g1, tab1, idx):7.2f} ms   "
          f"sorted {t(g1, tab1, idx_sorted):7.2f} ms", flush=True)

    # take with hints
    gt = jax.jit(lambda tb, i: jnp.sum(jnp.take(tb, i, axis=0,
                                                indices_are_sorted=True)))
    print(f"take sorted-hint (N,4): {t(gt, jnp.asarray(rng.integers(0, 2**32, (H*W, 4), dtype=np.uint64).astype(np.uint32)), idx_sorted):7.2f} ms",
          flush=True)

    # how much would the SORT itself cost (u32 keys + u32 payload)
    so = jax.jit(lambda i: jax.lax.sort_key_val(
        i, jax.lax.iota(jnp.int32, N))[1])
    print(f"sort 2M u32 key+idx:   {t(so, idx):7.2f} ms", flush=True)

    # windowed two-hot MXU sampler: per block of BR rays, a (BRxHw) and
    # (BRxWw) two-hot pair contracts a VMEM texture window.  Simulate the
    # all-coherent case in plain XLA: block-diag structure via vmap over
    # blocks, window 32x64 texels.
    BR, Hw, Ww = 2048, 32, 64
    nb = N // BR
    win = jnp.asarray(rng.random((nb, Hw, Ww * 3), dtype=np.float32))
    ry = jnp.asarray(rng.integers(0, Hw, (nb, BR)).astype(np.int32))
    rx = jnp.asarray(rng.integers(0, Ww, (nb, BR)).astype(np.int32))

    def twohot(i, n):
        io = jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], n), 1)
        return (io == i[:, None]).astype(jnp.float32)

    def blk(win_b, ry_b, rx_b):
        wv = twohot(ry_b, Hw)                        # (BR, Hw)
        tmp = jnp.dot(wv, win_b,
                      precision=jax.lax.Precision.HIGHEST)  # (BR, Ww*3)
        wu = twohot(rx_b, Ww)
        return jnp.einsum("rwc,rw->rc", tmp.reshape(BR, Ww, 3), wu,
                          precision=jax.lax.Precision.HIGHEST)

    f = jax.jit(lambda w, y, x: jnp.sum(jax.vmap(blk)(w, y, x)))
    print(f"windowed two-hot {Hw}x{Ww} ({nb} blocks x {BR} rays): "
          f"{t(f, win, ry, rx):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
