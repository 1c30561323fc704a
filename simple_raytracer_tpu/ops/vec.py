"""SoA 3-vector math for TPU.

The reference manipulates ``float3`` values per work-item (``src/render.cl``
throughout).  On TPU the idiomatic layout is structure-of-arrays: a "vector"
is three flat ``(N,)`` float32 arrays, so every elementwise op runs across the
full 8x128 VPU lane grid instead of wasting lanes on a size-3 minor axis.

``Vec3`` is a NamedTuple (hence automatically a JAX pytree) of component
arrays; all arithmetic is componentwise and broadcasts like jnp arrays.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic -------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return Vec3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- conversions ------------------------------------------------------
    @staticmethod
    def full(v, like=None):
        """Broadcast a python/scalar triple or scalar to a Vec3.

        np scalars, not jnp: identical dtype semantics, no backend touch
        at import, and no captured constants inside Pallas kernels."""
        import numpy as np
        if isinstance(v, Vec3):
            return v
        if isinstance(v, (tuple, list)):
            return Vec3(np.float32(v[0]), np.float32(v[1]), np.float32(v[2]))
        return Vec3(np.float32(v), np.float32(v), np.float32(v))

    @staticmethod
    def from_array(a):
        """(..., 3) array -> Vec3 of (...,) components."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def astype(self, dt):
        return Vec3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))

    @property
    def shape(self):
        return jnp.shape(self.x)


def dot(a: Vec3, b: Vec3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length_squared(v: Vec3) -> jnp.ndarray:
    """Mirrors ``length_squared`` (render.cl:165-167)."""
    return dot(v, v)


def length(v: Vec3) -> jnp.ndarray:
    return jnp.sqrt(dot(v, v))


def normalize(v: Vec3) -> Vec3:
    """OpenCL ``normalize``: v / length(v); 0-vector yields nan like the ref."""
    return v * (1.0 / length(v))


def where(mask: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    """Componentwise select; `mask` is a boolean (N,) array."""
    return Vec3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def mix(a: Vec3, b: Vec3, t: Scalar) -> Vec3:
    """OpenCL ``mix``: a + (b - a) * t (render.cl:427,432,436)."""
    return a + (b - a) * t


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a + (b - a) * t


def reflect(v: Vec3, n: Vec3) -> Vec3:
    """Mirrors ``reflect`` (render.cl:139-141): v - 2*dot(v,n)*n."""
    return v - n * (2.0 * dot(v, n))


def min3(v: Vec3) -> jnp.ndarray:
    return jnp.minimum(jnp.minimum(v.x, v.y), v.z)


def max3(v: Vec3) -> jnp.ndarray:
    return jnp.maximum(jnp.maximum(v.x, v.y), v.z)


def gather(v: Vec3, idx: jnp.ndarray) -> Vec3:
    """Gather rows of a table Vec3 by integer index array."""
    return Vec3(v.x[idx], v.y[idx], v.z[idx])
