"""Trustworthy TPU timing under a remote-attached (tunneled) device.

Plain `block_until_ready` loops mislead here in two ways (measured):
the runtime caches identical remote executions (same jit + same inputs
return without recomputing), and readiness can be reported ahead of
device completion.  The honest recipe:

  1. run N iterations INSIDE one jitted lax.fori_loop (per-dispatch
     latency paid once), with an input that varies per iteration so
     nothing is hoisted or cached;
  2. force execution with a small np.asarray readback of a reduction;
  3. difference two chain lengths so the constant dispatch + readback
     overhead cancels exactly.

Used by the perf scripts; engine.benchmark_step implements the same
methodology for the product path.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, n_hi: int = 24, n_lo: int = 3, reps: int = 2
            ) -> float:
    """Per-iteration seconds of `fn(i, *args) -> array`, i the iteration
    index.

    `fn` must make its computation depend on `i` (e.g. perturb an input
    by `i * eps`) or XLA will hoist it out of the loop.  Large arrays
    MUST come in through `*args` — a closed-over concrete array embeds
    as a program constant and the remote compile request ships it."""
    def make_chain(n):
        @jax.jit
        def chain(base, *a):
            def body(i, acc):
                r = fn(base + i, *a)
                return acc + jnp.sum(r[..., ::997])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return chain

    times = {}
    for _ in range(reps):
        for n in (n_lo, n_hi):
            chain = make_chain(n)
            float(np.asarray(chain(jnp.int32(1), *args)))   # compile+warm
            t0 = time.perf_counter()
            float(np.asarray(chain(jnp.int32(1000), *args)))
            times.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(times[n_hi]) - min(times[n_lo])) / (n_hi - n_lo)
