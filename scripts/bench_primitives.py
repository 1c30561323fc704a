"""Measure the TPU cost of the XLA primitives a wavefront/queue redesign
of the large-mesh path would lean on: argsort, paired sort, row gather
(at ray and granule granularity), scatter rows, lane cumsum, and the
dense (S, R) super-slab admission matrix.

These numbers decide whether ray-level compaction (gather rays into
per-cluster dense groups so Moller-Trumbore lanes only process admitted
pairs — the round-4 persistent-queue plan) can be built from XLA data
movement, or whether the permute must itself be a Pallas kernel.

Usage: python scripts/bench_primitives.py   (run on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.tpu_time import time_fn

R = 1920 * 1080          # 1080p 1spp ray count
G8 = R // 8              # 8-ray granules
G16 = R // 16
S = 48                   # supercluster count at 82K tris (648/16 padded)

key = jax.random.PRNGKey(0)
perm_r = jax.random.permutation(key, R).astype(jnp.int32)
perm_g8 = jax.random.permutation(key, G8).astype(jnp.int32)
perm_g16 = jax.random.permutation(key, G16).astype(jnp.int32)
keys_r = jax.random.randint(key, (R,), 0, S).astype(jnp.int32)
keys_g8 = jax.random.randint(key, (G8,), 0, S).astype(jnp.int32)
rays8 = jax.random.normal(key, (R, 8), jnp.float32)
gran64 = jax.random.normal(key, (G8, 64), jnp.float32)
gran128 = jax.random.normal(key, (G16, 128), jnp.float32)
vals_r = jax.random.normal(key, (R,), jnp.float32)
boxes = jax.random.normal(key, (S, 8), jnp.float32)


def row(label, fn, *args):
    t = time_fn(fn, *args)
    print(f"{label:44s} {t*1e3:9.3f} ms", flush=True)


print(f"R={R}  (1080p rays)   granules: {G8} x8, {G16} x16")

row("argsort (R,) i32",
    lambda i, k: jnp.argsort(k + i), keys_r)
row("argsort (G8,) i32",
    lambda i, k: jnp.argsort(k + i), keys_g8)
row("sort pairs (R,) key+val",
    lambda i, k, v: jax.lax.sort((k + i, v), num_keys=1)[1], keys_r, vals_r)
row("cumsum (R,) f32 lane axis",
    lambda i, v: jnp.cumsum(v + i), vals_r)
row("cumsum (S, R) f32 along R",
    lambda i, v: jnp.cumsum(jnp.broadcast_to(v + i, (8, R)), axis=1),
    vals_r)

row("row gather (R, 8) by (R,) perm",
    lambda i, t, p: t[(p + i) % R], rays8, perm_r)
row("row gather (G8, 64) by (G8,) perm",
    lambda i, t, p: t[(p + i) % G8], gran64, perm_g8)
row("row gather (G16, 128) by (G16,) perm",
    lambda i, t, p: t[(p + i) % G16], gran128, perm_g16)
row("row gather (G16, 128) by 2x(G16,) perm",
    lambda i, t, p: t[(p + i) % G16][(p * 7 + i) % G16],
    gran128, perm_g16)

row("scatter rows (R, 8) .at[perm].set",
    lambda i, t, p: jnp.zeros((R, 8), jnp.float32).at[(p + i) % R].set(t),
    rays8, perm_r)
row("scatter rows (G16, 128) .at[perm].set",
    lambda i, t, p: jnp.zeros((G16, 128), jnp.float32)
    .at[(p + i) % G16].set(t), gran128, perm_g16)
row("scatter-min (R,) lane .at[idx].min",
    lambda i, v, k: jnp.full((R,), jnp.inf, jnp.float32)
    .at[(k + i) % R].min(v), vals_r, perm_r)


print()
print("--- compaction at admitted sizes (the round-4 compact-then-trace"
      " path) ---")
# At bounce 1 of config 6 ~150K of the 2M rays admit >=1 supercluster;
# later bounces admit <72K.  The compact path needs, per bounce:
# build indices of admitting rays -> gather ~7 f32 lanes -> coherence
# argsort at the compacted size -> run the kernel -> scatter ~5 result
# lanes back.  These rows price that data movement.
admit_mask = (keys_r % 14) == 0                      # ~7% admit, like b1
for cap_name, CAP in (("128K", 131072), ("512K", 524288)):
    idx_cap = (perm_r[:CAP] % R).astype(jnp.int32)
    sort_keys = jax.random.randint(key, (CAP,), 0, S).astype(jnp.int32)
    lanes7 = jax.random.normal(key, (7, CAP), jnp.float32)

    row(f"nonzero(size={cap_name}) of (R,) mask",
        lambda i, m: jnp.nonzero(m != (i % 2 + 2), size=CAP,
                                 fill_value=0)[0],
        admit_mask.astype(jnp.int32))
    row(f"cumsum+scatter index build ({cap_name})",
        lambda i, m: jnp.zeros((CAP,), jnp.int32)
        .at[jnp.where(m != (i % 2 + 2),
                      jnp.cumsum((m != (i % 2 + 2)).astype(jnp.int32)) - 1,
                      CAP)]
        .set(jnp.arange(R, dtype=jnp.int32), mode="drop"),
        admit_mask.astype(jnp.int32))
    row(f"gather 7 f32 lanes (R,)->({cap_name},)",
        lambda i, v, ix: jnp.stack([jnp.take(v + j + i, ix, axis=0)
                                    for j in range(7)]),
        vals_r, idx_cap)
    row(f"argsort ({cap_name},) i32",
        lambda i, k: jnp.argsort(k + i), sort_keys)
    row(f"apply perm to 7 lanes ({cap_name},)",
        lambda i, l7, p: jnp.take(l7 + i, (p + i) % CAP, axis=1),
        lanes7, idx_cap[:CAP])
    row(f"scatter 5 f32 lanes ({cap_name},)->(R,)",
        lambda i, l7, ix: jnp.stack(
            [jnp.zeros((R,), jnp.float32).at[(ix + i) % R].set(l7[j])
             for j in range(5)]),
        lanes7, idx_cap)


def slab_sr(i, b, v):
    """(S, R) slab admission matrix + per-row popcount (the dense
    per-super prepass a compaction would need)."""
    o = v + i * 1e-6
    col = lambda j: b[:, j][:, None]
    t1 = (col(0) - o[None]) * (col(3) + 1.0)
    t2 = (col(1) - o[None]) * (col(4) + 1.0)
    t3 = (col(2) - o[None]) * (col(5) + 1.0)
    near = jnp.maximum(jnp.maximum(jnp.minimum(t1, t2),
                                   jnp.minimum(t2, t3)), 0.0)
    far = jnp.minimum(jnp.minimum(jnp.maximum(t1, t2),
                                  jnp.maximum(t2, t3)), 1e9)
    return (near <= far).sum(axis=1).astype(jnp.float32)


row(f"slab ({S}, R) admission + popcount", slab_sr, boxes, vals_r)
