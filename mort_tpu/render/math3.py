"""Batched 3-vector math on [..., 3] arrays (the vec3.cuh:13-227 analogue).

Every routine is shape-polymorphic and differentiable.  The reference's
rejection samplers (random_in_unit_sphere vec3.cuh:148-155,
random_in_unit_disk vec3.cuh:162-169) are replaced with exact analytic
transforms of counter-RNG uniforms — identical distributions with zero
divergence, which is what the TPU's SIMD execution model requires.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846


def safe_sqrt(x):
    """sqrt that is 0 for x<=0 AND has a finite gradient there.

    Reverse-mode AD of ``sqrt(maximum(x, 0))`` produces 0/0=NaN cotangents on
    masked-out lanes (d sqrt = 1/(2 sqrt) = inf at 0, times a zero cotangent);
    the double-where pattern keeps both forward and backward finite, which the
    differentiable render path requires.
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(dot(a, a))


def length_sq(a):
    return dot(a, a)


def unit(a):
    return a / length(a)[..., None]


def reflect(v, n):
    """v - 2*dot(v,n)*n (vec3.cuh:193-196)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv, n, etai_over_etat):
    """Snell refraction of unit vector uv (vec3.cuh:198-204)."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    r_out_parallel = -jnp.sqrt(jnp.abs(1.0 - length_sq(r_out_perp)))[..., None] * n
    return r_out_perp + r_out_parallel


def schlick(cosine, ref_idx):
    """Schlick reflectance approximation (vec3.cuh:206-212)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def unit_sphere_dir(u1, u2):
    """Uniform direction on the unit sphere from two uniforms (analytic
    replacement for random_unit_vector, vec3.cuh:157-160)."""
    z = 1.0 - 2.0 * u1
    r = safe_sqrt(1.0 - z * z)
    phi = (2.0 * PI) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def cosine_dir(u1, u2):
    """Cosine-weighted hemisphere direction in local frame
    (random_cosine_direction, vec3.cuh:181-191)."""
    phi = (2.0 * PI) * u1
    sq = safe_sqrt(u2)
    return jnp.stack(
        [jnp.cos(phi) * sq, jnp.sin(phi) * sq, safe_sqrt(1.0 - u2)],
        axis=-1,
    )


def onb_from_w(w):
    """Orthonormal basis (u, v, unit_w) from a direction (onb.cuh:41-50)."""
    unit_w = unit(w)
    a = jnp.where(
        (jnp.abs(unit_w[..., 0]) > 0.9)[..., None],
        jnp.array([0.0, 1.0, 0.0], unit_w.dtype),
        jnp.array([1.0, 0.0, 0.0], unit_w.dtype),
    )
    v = unit(cross(unit_w, a))
    u = cross(unit_w, v)
    return u, v, unit_w


def onb_local(u, v, w, a):
    """a.x*u + a.y*v + a.z*w (onb.cuh:36-39)."""
    return a[..., 0:1] * u + a[..., 1:2] * v + a[..., 2:3] * w


def rotate_around(vec, axis, theta):
    """Rotate ``vec`` around ``axis`` by ``theta`` radians
    (rotate_around, vec3.cuh:214-227; used for mouse-orbit camera control)."""
    a_par = (dot(vec, axis) / dot(axis, axis))[..., None] * axis
    a_ort = vec - a_par
    w = cross(axis, a_ort)
    x1 = jnp.cos(theta) / length(a_ort)
    x2 = jnp.sin(theta) / length(w)
    a_rot = length(a_ort)[..., None] * (x1[..., None] * a_ort + x2[..., None] * w)
    return a_rot + a_par
