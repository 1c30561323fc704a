"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first jax import so multi-chip sharding tests
can run without TPU hardware (SURVEY §4: CPU fallback via
xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported by an interpreter-startup plugin, in which case
# env vars were read too early — config.update still wins before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeat test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/srt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


# -- scalar NumPy oracle of the reference RNG (render.cl:143-163) ---------
# Used by unit tests to check the vectorized jnp implementation draw-by-draw.

def ref_random_float(seed: int):
    seed = (seed * 747796405 + 2891336453) & 0xFFFFFFFF
    result = (((seed >> ((seed >> 28) + 4)) ^ seed) * 277803737) & 0xFFFFFFFF
    result = (result >> 22) ^ result
    return seed, np.float32(result) / np.float32(0xFFFFFFFF)


def ref_random_normal(seed: int):
    seed, u1 = ref_random_float(seed)
    seed, u2 = ref_random_float(seed)
    theta = np.float32(2.0 * np.float32(np.pi)) * u1
    rho = np.sqrt(np.float32(-2.0) * np.log(u2))
    return seed, np.float32(rho * np.cos(theta))
