"""Gather strategies for TPU.

XLA lowers dynamic gathers element-serially on TPU unless the table is a
compile-time constant (measured: a 14-field material fetch for 2M rays
costs ~3 ms with the table baked into the program but ~130 ms when the
scene is a jit argument — which it must be, so scene edits never
recompile).  For small tables the fix is a one-hot matmul on the MXU:
build (R, K) one-hot rows from the indices and multiply by the (K, F)
table.  With 0/1 weights and precision HIGHEST the result is bit-exact
f32 (each output row is a single table row reproduced exactly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# tables at or below this many rows use the one-hot matmul; larger tables
# use a row gather (one gather moving whole rows — ~8 ms for 2M indices,
# amortized and independent of table size)
ONEHOT_MAX_ROWS = 1024


def onehot_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(K, F) table, (R,) int indices -> (R, F) rows, via MXU matmul."""
    k = table.shape[0]
    iota = jnp.arange(k, dtype=jnp.int32)[None, :]
    oh = (idx.astype(jnp.int32)[:, None] == iota).astype(table.dtype)
    return jnp.dot(oh, table, precision=jax.lax.Precision.HIGHEST)


def onehot_gather_t(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(K, F) table, (R,) int indices -> (F, R) columns, via a transposed
    one-hot MXU contraction (exact: 0/1 weights select one row)."""
    k = table.shape[0]
    iota = jnp.arange(k, dtype=jnp.int32)[:, None]
    oh = (iota == idx.astype(jnp.int32)[None, :]).astype(table.dtype)
    return jax.lax.dot_general(table, oh, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def table_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row fetch with the TPU-appropriate strategy by table size.

    Beware the consumers: an (R, F) result with small F is lane-padded to
    (R, 128) physically, and when XLA unfuses the column-slice consumers,
    each re-scans the whole padded buffer (measured 5.7 ms PER COLUMN at
    R=2M, F=20 on the mesh shading path — an explicit transpose doesn't
    help, XLA folds it back into a bitcast).  Hot paths that need many
    fields per row should produce them in (F, R) orientation at the
    source instead, as the BVH kernel does for triangle shading."""
    if table.shape[0] <= ONEHOT_MAX_ROWS:
        return onehot_gather(table, idx)
    return table[idx]


def table_gather_t(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row fetch returning the TRANSPOSED (F, R) result — the layout hot
    consumers should use on TPU (see table_gather's warning).  Small tables
    produce it directly on the MXU; large tables pay one gather plus a
    transpose (still one scan instead of one per consumed field)."""
    if table.shape[0] <= ONEHOT_MAX_ROWS:
        return onehot_gather_t(table, idx)
    return table[idx].T
