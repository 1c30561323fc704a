"""Multi-host (multi-process) rendering over DCN.

The reference is strictly single-device (SURVEY C24: one OpenCL device,
no inter-device communication).  Multi-host is a new capability of the
TPU framework: each process drives its local chips, `jax.distributed`
links the processes, and the existing shard_map DP step (parallel/shard.py)
works unchanged over a process-spanning mesh because `jax.devices()` is
GLOBAL after initialization and rendering is communication-free — the DP
axis only gathers tonemapped pixels at image-save time (over ICI within a
host, DCN across hosts).

Typical multi-host launch (one command per host):

    srt-render --config 2 --all-devices --distributed \
        --coordinator host0:9999 --num-processes 4 --process-id $i ...

Only process 0 writes the output file; the others render their bands and
exit after the final gather.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    With no arguments, defers to JAX's environment autodetection (TPU pod
    metadata, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID set by a launcher).  Must be called before the first
    device access in the process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def fetch_canvas(canvas) -> "np.ndarray":  # noqa: F821
    """Materialize a (possibly process-spanning) sharded canvas on every
    host as a NumPy array.

    Single-process: a plain device->host copy (np.asarray triggers the
    cross-device gather over ICI).  Multi-process: each host can only
    address its local shards, so the missing bands travel over DCN via an
    all-gather; every process returns the full image (process 0 is the
    one that typically saves it)."""
    import numpy as np

    if not is_multiprocess():
        return np.asarray(canvas)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(canvas, tiled=True))


def should_write_output() -> bool:
    """Only one process writes artifacts (files, logs) in a multi-host
    render."""
    return jax.process_index() == 0
