"""Light-source sampling: the hittable_pdf / mixture-PDF machinery.

Replaces the reference's heap-allocated pdf object hierarchy
(pdf.cuh:12-107, built with `new`/`delete` per bounce — camera.cuh:142-144)
with pure vectorised functions over the static light list.  Material
shading itself lives in hitshade.py (fused over the primitive join).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..scene.build import SceneData, SceneMeta
from ..scene.types import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_METAL, OBJ_QUAD, OBJ_SPHERE,
)
from .. import rng as rngm
from . import math3 as m3
from .intersect import Hit, QuadFrames, T_MIN

INV_4PI = 1.0 / (4.0 * m3.PI)


# ---------------------------------------------------------------------------
# Light pdf/sampling (hittable_pdf + hittable_list uniform pick,
# pdf.cuh:60-80, objects.cuh:489-504)
# ---------------------------------------------------------------------------

def _sphere_light_pdf(data: SceneData, row: int, p, direction):
    """sphere::pdf_value (objects.cuh:110-122): solid-angle pdf, 0 on miss."""
    c = data.sph_center[row]
    r = data.sph_radius[row]
    oc = p - c[None, :]
    a = m3.length_sq(direction)
    half_b = m3.dot(oc, direction)
    c_term = m3.length_sq(oc) - r * r
    disc = half_b * half_b - a * c_term
    sq = m3.safe_sqrt(disc)
    root1 = (-half_b - sq) / a
    root2 = (-half_b + sq) / a
    root = jnp.where(root1 > T_MIN, root1, root2)
    hits = (disc >= 0.0) & (root > T_MIN)
    # The reference yields NaN for p inside the light sphere
    # (objects.cuh:118, sqrt of a negative); we clamp to 0 (gradient safety)
    # — only reachable in degenerate scenes, and the oracle mirrors this.
    cos_theta_max = m3.safe_sqrt(1.0 - r * r / m3.length_sq(c[None, :] - p))
    solid_angle = 2.0 * m3.PI * (1.0 - cos_theta_max)
    return jnp.where(hits, 1.0 / solid_angle, 0.0)


def _sphere_light_sample(data: SceneData, row: int, p, u1, u2):
    """sphere::random via random_to_sphere (objects.cuh:124-145)."""
    c = data.sph_center[row]
    direction = c[None, :] - p
    dist_sq = m3.length_sq(direction)
    r = data.sph_radius[row]
    z = 1.0 + u2 * (m3.safe_sqrt(1.0 - r * r / dist_sq) - 1.0)
    phi = 2.0 * m3.PI * u1
    s = m3.safe_sqrt(1.0 - z * z)
    local = jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, z], axis=-1)
    bu, bv, bw = m3.onb_from_w(direction)
    return m3.onb_local(bu, bv, bw, local)


def _quad_light_pdf(data: SceneData, qf: QuadFrames, row: int, p, direction):
    """quad::pdf_value (objects.cuh:217-229): area-measure pdf, 0 on miss."""
    nrm = qf.normal[row]
    denom = m3.dot(direction, nrm[None, :])
    ok_denom = jnp.abs(denom) >= 1e-8
    t = jnp.where(ok_denom,
                  (qf.D[row] - m3.dot(p, nrm[None, :]))
                  / jnp.where(ok_denom, denom, 1.0),
                  -1.0)
    alpha = (m3.dot(p, qf.vxw[row][None, :]) + t * m3.dot(direction, qf.vxw[row][None, :])
             - qf.qa[row])
    beta = (m3.dot(p, qf.wxu[row][None, :]) + t * m3.dot(direction, qf.wxu[row][None, :])
            - qf.qb[row])
    hits = (ok_denom & (t > T_MIN)
            & (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1))
    dist_sq = t * t * m3.length_sq(direction)
    cosine = jnp.abs(denom) / m3.length(direction)
    return jnp.where(hits, dist_sq / (cosine * qf.area[row]), 0.0)


def _quad_light_sample(data: SceneData, row: int, p, u1, u2):
    """quad::random (objects.cuh:231-235): uniform point minus origin."""
    point = (data.quad_Q[row][None, :]
             + u1[:, None] * data.quad_u[row][None, :]
             + u2[:, None] * data.quad_v[row][None, :])
    return point - p


def lights_pdf_value(data, meta, qf, p, direction):
    """hittable_list::pdf_value: average over light members (objects.cuh:489-498)."""
    vals = []
    for light in meta.lights:
        if light.kind == OBJ_SPHERE:
            vals.append(_sphere_light_pdf(data, light.row, p, direction))
        else:
            vals.append(_quad_light_pdf(data, qf, light.row, p, direction))
    return sum(vals) / len(vals)


def lights_sample(data, meta, p, pick_u, u1, u2):
    """hittable_list::random: uniform member pick (objects.cuh:500-504)."""
    n = len(meta.lights)
    out = None
    if n == 1:
        light = meta.lights[0]
        if light.kind == OBJ_SPHERE:
            return _sphere_light_sample(data, light.row, p, u1, u2)
        return _quad_light_sample(data, light.row, p, u1, u2)
    pick = jnp.minimum((pick_u * n).astype(jnp.int32), n - 1)
    for i, light in enumerate(meta.lights):
        if light.kind == OBJ_SPHERE:
            d = _sphere_light_sample(data, light.row, p, u1, u2)
        else:
            d = _quad_light_sample(data, light.row, p, u1, u2)
        out = d if out is None else jnp.where((pick == i)[:, None], d, out)
    return out
