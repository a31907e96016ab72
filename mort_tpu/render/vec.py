"""Structure-of-arrays 3-vectors: the TPU-native hot-path vector type.

A batch of R vectors as an [R,3] array puts 3 elements in the TPU's
128-lane minor dimension — every elementwise op then wastes ~40x compute
and bandwidth on lane padding, and every dot product becomes a cross-lane
reduction (profiled as the dominant cost of the wavefront loop's XLA
glue).  ``V3`` instead keeps three flat [R] arrays: all vector algebra is
pure elementwise VPU work on exactly-tiled (8,128) blocks and a dot
product is two multiply-adds, no reduction.

V3 is a NamedTuple, hence automatically a JAX pytree; it composes with
jit/grad/vmap/scan and with flax struct dataclasses.

This mirrors the reference's vec3 (vec3.cuh:13-227) in *semantics*; the
layout is the TPU-idiomatic transpose of it.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

PI = 3.14159265358979323846


class V3(NamedTuple):
    x: Any
    y: Any
    z: Any

    # -- algebra ----------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- conversions ------------------------------------------------------
    @staticmethod
    def from_rows(a):
        """[..., 3] array -> V3 of [...] components."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def from_cols(a, c0=0):
        """[R, K] array -> V3 from columns c0..c0+2 (table row extracts)."""
        return V3(a[:, c0], a[:, c0 + 1], a[:, c0 + 2])

    @staticmethod
    def full_like(t, cx, cy, cz):
        o = jnp.ones_like(t)
        return V3(o * cx, o * cy, o * cz)

    @staticmethod
    def zeros(shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    @staticmethod
    def ones(shape, dtype=jnp.float32):
        o = jnp.ones(shape, dtype)
        return V3(o, o, o)

    def to_rows(self):
        """V3 of [...] -> [..., 3] (AoS boundary, e.g. matmul inputs)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)


def where(mask, a, b):
    """Lane-masked select; mask is [R] (broadcast over components)."""
    if isinstance(a, V3):
        ax, ay, az = a
    else:
        ax = ay = az = a
    if isinstance(b, V3):
        bx, by, bz = b
    else:
        bx = by = bz = b
    return V3(jnp.where(mask, ax, bx), jnp.where(mask, ay, by),
              jnp.where(mask, az, bz))


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length_sq(a: V3):
    return dot(a, a)


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def safe_sqrt(x):
    """sqrt that is 0 for x<=0 with a finite gradient (see math3.safe_sqrt)."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def unit(a: V3) -> V3:
    inv = 1.0 / length(a)
    return V3(a.x * inv, a.y * inv, a.z * inv)


def reflect(v: V3, n: V3) -> V3:
    d = 2.0 * dot(v, n)
    return V3(v.x - d * n.x, v.y - d * n.y, v.z - d * n.z)


def refract(uv: V3, n: V3, etai_over_etat) -> V3:
    """Snell refraction of unit vector uv (vec3.cuh:198-204).

    The sqrt argument is floored away from 0: at the total-internal-
    reflection boundary |perp|^2 -> 1 the sqrt derivative diverges, and the
    0-cotangent x inf product poisons reverse-mode gradients of the lanes
    that chose the *reflect* branch (observed as NaN d(loss)/d(ior) on the
    cornell glass sphere).  Forward values change by < 1e-10."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    perp = (uv + cos_theta * n) * etai_over_etat
    par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - length_sq(perp)), 1e-20))
    return perp + n * par


def schlick(cosine, ref_idx):
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def unit_sphere_dir(u1, u2) -> V3:
    """Uniform direction on the unit sphere from two uniforms."""
    z = 1.0 - 2.0 * u1
    r = safe_sqrt(1.0 - z * z)
    phi = (2.0 * PI) * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def cosine_dir(u1, u2) -> V3:
    """Cosine-weighted hemisphere direction in the local ONB frame."""
    phi = (2.0 * PI) * u1
    sq = safe_sqrt(u2)
    return V3(jnp.cos(phi) * sq, jnp.sin(phi) * sq, safe_sqrt(1.0 - u2))


def onb_from_w(w: V3):
    """Orthonormal basis (u, v, unit_w) from a direction (onb.cuh:41-50)."""
    uw = unit(w)
    big_x = jnp.abs(uw.x) > 0.9
    a = V3(jnp.where(big_x, 0.0, 1.0), jnp.where(big_x, 1.0, 0.0),
           jnp.zeros_like(uw.x))
    v = unit(cross(uw, a))
    u = cross(uw, v)
    return u, v, uw


def onb_local(u: V3, v: V3, w: V3, a: V3) -> V3:
    """a.x*u + a.y*v + a.z*w (onb.cuh:36-39)."""
    return V3(a.x * u.x + a.y * v.x + a.z * w.x,
              a.x * u.y + a.y * v.y + a.z * w.y,
              a.x * u.z + a.y * v.z + a.z * w.z)
