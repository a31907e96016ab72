"""Light-source sampling: the hittable_pdf / mixture-PDF machinery.

Replaces the reference's heap-allocated pdf object hierarchy
(pdf.cuh:12-107, built with `new`/`delete` per bounce — camera.cuh:142-144)
with pure vectorised functions over the static light list.  Material
shading itself lives in hitshade.py (fused over the primitive join).

All batched vectors are structure-of-arrays V3 (render/vec.py); per-light
constants ([3] arrays indexed per component) broadcast against them.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.build import SceneData, SceneMeta
from ..scene.types import OBJ_SPHERE
from . import vec as v3
from .vec import V3
from .intersect import QuadFrames, T_MIN

PI = v3.PI
INV_4PI = 1.0 / (4.0 * PI)


def _const3(a):
    """[3] device array -> V3 of scalars (broadcasts against [R] lanes)."""
    return V3(a[0], a[1], a[2])


# ---------------------------------------------------------------------------
# Light pdf/sampling (hittable_pdf + hittable_list uniform pick,
# pdf.cuh:60-80, objects.cuh:489-504)
# ---------------------------------------------------------------------------

def _sphere_light_pdf(data: SceneData, row: int, p: V3, direction: V3):
    """sphere::pdf_value (objects.cuh:110-122): solid-angle pdf, 0 on miss.

    The returned value is computed from ``hits``-sanitized inputs: the
    masked-out branch of the final where must stay finite in BOTH passes,
    or its VJP's 0-cotangent x overflow products poison upstream gradients
    (the masked lanes include grazing directions whose intermediate values
    overflow float32 when differentiated).
    """
    c = _const3(data.sph_center[row])
    r = data.sph_radius[row]
    oc = p - c
    a = jnp.maximum(v3.length_sq(direction), 1e-20)
    half_b = v3.dot(oc, direction)
    c_term = v3.length_sq(oc) - r * r
    disc = half_b * half_b - a * c_term
    sq = v3.safe_sqrt(disc)
    root1 = (-half_b - sq) / a
    root2 = (-half_b + sq) / a
    root = jnp.where(root1 > T_MIN, root1, root2)
    hits = (disc >= 0.0) & (root > T_MIN)
    # The reference yields NaN for p inside the light sphere
    # (objects.cuh:118, sqrt of a negative); we clamp to 0 (gradient safety)
    # — only reachable in degenerate scenes, and the oracle mirrors this.
    cos_theta_max = v3.safe_sqrt(1.0 - r * r / v3.length_sq(c - p))
    solid_angle = jnp.maximum(2.0 * PI * (1.0 - cos_theta_max), 1e-12)
    return jnp.where(hits, 1.0 / solid_angle, 0.0)


def _sphere_light_sample(data: SceneData, row: int, p: V3, u1, u2) -> V3:
    """sphere::random via random_to_sphere (objects.cuh:124-145)."""
    c = _const3(data.sph_center[row])
    direction = c - p
    dist_sq = v3.length_sq(direction)
    r = data.sph_radius[row]
    z = 1.0 + u2 * (v3.safe_sqrt(1.0 - r * r / dist_sq) - 1.0)
    phi = 2.0 * PI * u1
    s = v3.safe_sqrt(1.0 - z * z)
    local = V3(jnp.cos(phi) * s, jnp.sin(phi) * s, z)
    bu, bv, bw = v3.onb_from_w(direction)
    return v3.onb_local(bu, bv, bw, local)


def _quad_light_pdf(data: SceneData, qf: QuadFrames, row: int, p: V3,
                    direction: V3):
    """quad::pdf_value (objects.cuh:217-229): area-measure pdf, 0 on miss."""
    nrm = _const3(qf.normal[row])
    vxw = _const3(qf.vxw[row])
    wxu = _const3(qf.wxu[row])
    denom = v3.dot(direction, nrm)
    ok_denom = jnp.abs(denom) >= 1e-8
    t = jnp.where(ok_denom,
                  (qf.D[row] - v3.dot(p, nrm))
                  / jnp.where(ok_denom, denom, 1.0),
                  -1.0)
    alpha = v3.dot(p, vxw) + t * v3.dot(direction, vxw) - qf.qa[row]
    beta = v3.dot(p, wxu) + t * v3.dot(direction, wxu) - qf.qb[row]
    hits = (ok_denom & (t > T_MIN)
            & (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1))
    # the returned pdf is computed from hits-sanitized values: masked-out
    # grazing lanes reach t ~ num/1e-8 whose VJP (~num^2/denom^3) overflows
    # float32, and 0-cotangent x inf = NaN poisons gradients upstream
    # (observed as NaN d(loss)/d(ior) through a p -> earlier-bounce chain)
    t_s = jnp.where(hits, t, 1.0)
    denom_s = jnp.where(hits, denom, 1.0)
    dist_sq = t_s * t_s * v3.length_sq(direction)
    cosine = jnp.abs(denom_s) / jnp.maximum(v3.length(direction), 1e-10)
    return jnp.where(hits, dist_sq / (cosine * qf.area[row]), 0.0)


def _quad_light_sample(data: SceneData, row: int, p: V3, u1, u2) -> V3:
    """quad::random (objects.cuh:231-235): uniform point minus origin."""
    Q = _const3(data.quad_Q[row])
    u = _const3(data.quad_u[row])
    v = _const3(data.quad_v[row])
    return V3(Q.x + u1 * u.x + u2 * v.x - p.x,
              Q.y + u1 * u.y + u2 * v.y - p.y,
              Q.z + u1 * u.z + u2 * v.z - p.z)


def lights_pdf_value(data, meta, qf, p: V3, direction: V3):
    """hittable_list::pdf_value: average over light members (objects.cuh:489-498)."""
    vals = []
    for light in meta.lights:
        if light.kind == OBJ_SPHERE:
            vals.append(_sphere_light_pdf(data, light.row, p, direction))
        else:
            vals.append(_quad_light_pdf(data, qf, light.row, p, direction))
    return sum(vals) / len(vals)


def lights_sample(data, meta, p: V3, pick_u, u1, u2) -> V3:
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
        out = d if out is None else v3.where(pick == i, d, out)
    return out
