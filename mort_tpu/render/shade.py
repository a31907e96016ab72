"""Vectorised material shading + mixture-PDF importance sampling.

Replaces the reference's scatter/emit/scatterPdf switch dispatchers
(materials.cuh:272-349) and the heap-allocated pdf object hierarchy
(pdf.cuh:12-107, built with `new`/`delete` per bounce — camera.cuh:142-144)
with pure masked arithmetic over material-kind tags.  All five materials and
both sampling strategies are evaluated branch-free; static SceneMeta flags
prune kinds that don't occur in the scene at trace time.

Monte-Carlo estimator parity (camera.cuh:96-159):
  * metal/dielectric: skip_pdf rays, weight = attenuation, stored emission 0
    (camera.cuh:105-113).
  * lambertian/isotropic: 50/50 mixture of material pdf and light pdf
    (camera.cuh:118-133, pdf.cuh:82-107), weight = attenuation *
    scatter_pdf / pdf.  pdf == 0 contributes 0 (the reference produces
    inf/NaN and later scrubs the pixel, camera.cuh:196-198; we clamp at the
    source, keeping converged images identical).
  * diffuse_light: no scatter, path terminates with emitted light
    (materials.cuh:151-163).
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


@struct.dataclass
class ShadeOut:
    emission: Any    # [R,3] emitted light at the hit (diffuse_light only)
    weight: Any      # [R,3] path throughput factor attenuation*spdf/pdf
    new_dir: Any     # [R,3] next ray direction (unnormalised, as reference)
    scatter_ok: Any  # [R] bool: material scattered (false -> terminate)
    skip_pdf: Any    # [R] bool: specular bounce (no MIS, no stored emission)


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


# ---------------------------------------------------------------------------
# Shading
# ---------------------------------------------------------------------------

def shade(data: SceneData, meta: SceneMeta, qf: QuadFrames, hit: Hit,
          ro, rd, time, seed, pixel, sample, bounce) -> ShadeOut:
    R = ro.shape[0]
    kind_arr = jnp.asarray(meta.mat_kind, jnp.int32)
    kind = kind_arr[hit.mat]
    kinds_present = set(meta.mat_kind)

    mix_u, pick_u, diel_u, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_MIX)
    m1, m2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_MAT_DIR)
    l1, l2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_LIGHT_DIR)
    f1, f2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_FUZZ)

    needs_tex = kinds_present & {MAT_LAMBERTIAN, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC}
    if needs_tex:
        from .textures import texture_value
        tex_val = texture_value(data, meta, data.mat_tex[hit.mat], hit.u, hit.v, hit.p)
    else:
        tex_val = jnp.ones((R, 3), jnp.float32)

    # Emission (emitDispatch, materials.cuh:298-322; front-face only,
    # materials.cuh:157-162).
    if MAT_DIFFUSE_LIGHT in kinds_present:
        is_light = kind == MAT_DIFFUSE_LIGHT
        emission = jnp.where((is_light & hit.front_face)[:, None], tex_val, 0.0)
    else:
        emission = jnp.zeros((R, 3), jnp.float32)

    # Attenuation per kind.
    attenuation = tex_val
    if MAT_METAL in kinds_present:
        attenuation = jnp.where((kind == MAT_METAL)[:, None],
                                data.mat_albedo[hit.mat], attenuation)
    if MAT_DIELECTRIC in kinds_present:
        # dielectric attenuation is hard-coded white (materials.cuh:109).
        attenuation = jnp.where((kind == MAT_DIELECTRIC)[:, None], 1.0, attenuation)

    skip_pdf = (kind == MAT_METAL) | (kind == MAT_DIELECTRIC)
    scatter_ok = kind != MAT_DIFFUSE_LIGHT

    # --- specular branch directions ---
    skip_dir = jnp.zeros((R, 3), jnp.float32).at[:, 0].set(1.0)
    if MAT_METAL in kinds_present:
        refl = m3.reflect(rd, hit.normal)
        fuzz = data.mat_fuzz[hit.mat]
        metal_dir = m3.unit(refl) + fuzz[:, None] * m3.unit_sphere_dir(f1, f2)
        skip_dir = jnp.where((kind == MAT_METAL)[:, None], metal_dir, skip_dir)
    if MAT_DIELECTRIC in kinds_present:
        ior = data.mat_ior[hit.mat]
        ratio = jnp.where(hit.front_face, 1.0 / ior, ior)
        ud = m3.unit(rd)
        cos_theta = jnp.minimum(m3.dot(-ud, hit.normal), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
        cannot_refract = ratio * sin_theta > 1.0
        reflect_choice = cannot_refract | (m3.schlick(cos_theta, ratio) > diel_u)
        d_dir = jnp.where(reflect_choice[:, None],
                          m3.reflect(ud, hit.normal),
                          m3.refract(ud, hit.normal, ratio))
        skip_dir = jnp.where((kind == MAT_DIELECTRIC)[:, None], d_dir, skip_dir)

    # --- pdf branch (lambertian cosine / isotropic sphere) ---
    diffuse_present = kinds_present & {MAT_LAMBERTIAN, MAT_ISOTROPIC}
    if diffuse_present:
        bu, bv, bw = m3.onb_from_w(hit.normal)
        mat_dir = m3.onb_local(bu, bv, bw, m3.cosine_dir(m1, m2))
        if MAT_ISOTROPIC in kinds_present:
            iso_dir = m3.unit_sphere_dir(m1, m2)
            mat_dir = jnp.where((kind == MAT_ISOTROPIC)[:, None], iso_dir, mat_dir)

        if meta.lights:
            light_dir = lights_sample(data, meta, hit.p, pick_u, l1, l2)
            gen_dir = jnp.where((mix_u < 0.5)[:, None], light_dir, mat_dir)
            light_pdf = lights_pdf_value(data, meta, qf, hit.p, gen_dir)
        else:
            gen_dir = mat_dir
            light_pdf = 0.0

        # material pdf value of the generated direction (pdf.cuh:40-58, 24-38)
        cos_pdf = jnp.maximum(0.0, m3.dot(m3.unit(gen_dir), bw) / m3.PI)
        mat_pdf = cos_pdf
        if MAT_ISOTROPIC in kinds_present:
            mat_pdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, mat_pdf)

        if meta.lights:
            pdf = 0.5 * light_pdf + 0.5 * mat_pdf     # mixture_pdf (pdf.cuh:91-92)
        else:
            pdf = mat_pdf

        # scatterPdfDispatch (materials.cuh:324-349)
        cos_s = m3.dot(hit.normal, m3.unit(gen_dir))
        spdf = jnp.where(cos_s < 0.0, 0.0, cos_s / m3.PI)
        if MAT_ISOTROPIC in kinds_present:
            spdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, spdf)

        diffuse_weight = jnp.where((pdf > 0.0)[:, None],
                                   attenuation * (spdf / jnp.where(pdf > 0, pdf, 1.0))[:, None],
                                   0.0)
    else:
        gen_dir = skip_dir
        diffuse_weight = jnp.zeros((R, 3), jnp.float32)

    weight = jnp.where(skip_pdf[:, None], attenuation, diffuse_weight)
    new_dir = jnp.where(skip_pdf[:, None], skip_dir, gen_dir)
    return ShadeOut(emission=emission, weight=weight, new_dir=new_dir,
                    scatter_ok=scatter_ok, skip_pdf=skip_pdf)
