"""Fused hit-finalize + shading over the joined primitive table.

Replaces the gather-heavy finalize_hit + shade pair with a single
[R]-gather from the primtable join followed by pure elementwise work.
Semantics are identical to the reference dispatch chain (emitDispatch /
scatterDispatch / scatterPdfDispatch + mixture PDF, camera.cuh:96-159,
materials.cuh:272-349) — verified against the CPU oracle.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..scene.build import SceneData, SceneMeta
from ..scene.types import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_METAL,
)
from .. import rng as rngm
from . import math3 as m3
from . import primtable as pt
from .intersect import K_MEDIUM0, K_NONE, K_QUAD, K_SPHERE, QuadFrames
from .shade import lights_pdf_value, lights_sample

INV_4PI = 1.0 / (4.0 * m3.PI)
UV_CLAMP = 1.0 - 2.0 ** -20


@struct.dataclass
class BounceOut:
    hit: Any         # [R] bool
    p: Any           # [R,3]
    emission: Any    # [R,3]
    weight: Any      # [R,3]
    new_dir: Any     # [R,3]
    scatter_ok: Any  # [R] bool
    skip_pdf: Any    # [R] bool


def finalize_and_shade(data: SceneData, meta: SceneMeta, qf: QuadFrames,
                       table, mat_cols, ro, rd, time, best_t, best_kind,
                       best_idx, seed, pixel, sample, bounce,
                       row=None) -> BounceOut:
    """``row``: optional precomputed [R, >=K] joined rows (the pallas kernel
    emits them via an in-VMEM one-hot matmul); when None, gathered here."""
    R = ro.shape[0]
    Ns = data.sph_center.shape[0]
    hit = best_kind != K_NONE

    if row is None:
        # ---- THE gather: one row of the joined table per ray ----
        g = jnp.where(best_kind == K_QUAD, best_idx + Ns, best_idx)
        g = jnp.clip(g, 0, table.shape[0] - 1)
        row = table[g]                   # [R, K]
    else:
        row = row[:, :pt.K]

    # media override rows (few, static)
    for m, med in enumerate(meta.media):
        sel = (best_kind == K_MEDIUM0 + m)[:, None]
        med_row = jnp.concatenate(
            [mat_cols[med.mat_row], jnp.zeros(pt.K - 16, jnp.float32)])
        row = jnp.where(sel, med_row[None, :], row)

    t = jnp.where(hit, best_t, 1.0)
    p = ro + t[:, None] * rd

    is_sphere = best_kind == K_SPHERE
    is_quad = best_kind == K_QUAD
    is_medium = best_kind >= K_MEDIUM0

    g0 = row[:, pt.COL_G0:pt.COL_G0 + 3]
    g1 = row[:, pt.COL_G1:pt.COL_G1 + 3]
    g2 = row[:, pt.COL_G2:pt.COL_G2 + 3]
    s0 = row[:, pt.COL_S0]
    s1 = row[:, pt.COL_S1]

    # ---- geometry / normals (objects.cuh:79-86, 206-213, 428-429) ----
    if meta.any_moving:
        c_t = g0 + time[:, None] * g1
    else:
        c_t = g0
    r_safe = jnp.where(is_sphere & (s0 != 0.0), s0, 1.0)
    outward = (p - c_t) / r_safe[:, None]        # sphere outward normal
    n_raw = jnp.where(is_sphere[:, None], outward, g0)  # quad unit normal in G0
    front = m3.dot(rd, n_raw) < 0.0
    normal = jnp.where(front[:, None], n_raw, -n_raw)
    # media: arbitrary fixed normal/front (objects.cuh:428-429)
    normal = jnp.where(is_medium[:, None],
                       jnp.array([1.0, 0.0, 0.0], jnp.float32), normal)
    front = jnp.where(is_medium, True, front)

    # ---- uv (only needed for image textures; quads get alpha/beta free) ----
    if meta.n_images > 0:
        theta = jnp.arccos(jnp.clip(-outward[:, 1], -UV_CLAMP, UV_CLAMP))
        phi = jnp.arctan2(-outward[:, 2], outward[:, 0]) + m3.PI
        su = phi / (2.0 * m3.PI)
        sv = theta / m3.PI
        alpha_q = m3.dot(p, g1) - s0
        beta_q = m3.dot(p, g2) - s1
        uu = jnp.where(is_quad, alpha_q, jnp.where(is_sphere, su, 0.0))
        vv = jnp.where(is_quad, beta_q, jnp.where(is_sphere, sv, 0.0))
    else:
        uu = jnp.zeros(R, jnp.float32)
        vv = jnp.zeros(R, jnp.float32)

    kind = row[:, pt.COL_KIND].astype(jnp.int32)
    kinds_present = set(meta.mat_kind)

    # ---- RNG draws ----
    mix_u, pick_u, diel_u, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_MIX)
    m1, m2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_MAT_DIR)
    l1, l2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_LIGHT_DIR)
    f1, f2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce, rngm.SLOT_FUZZ)

    # ---- attenuation: baked solid/checker (textures.cuh:24-60) ----
    grid = jnp.floor(row[:, pt.COL_INVSC:pt.COL_INVSC + 1] * p).astype(jnp.int32)
    is_even = (grid[:, 0] + grid[:, 1] + grid[:, 2]) % 2 == 0
    attenuation = jnp.where(is_even[:, None],
                            row[:, pt.COL_A:pt.COL_A + 3],
                            row[:, pt.COL_B:pt.COL_B + 3])
    emission_color = row[:, pt.COL_E:pt.COL_E + 3]

    # ---- fallback textures (image/noise/non-bakeable) ----
    if meta.n_images > 0 or meta.n_noise > 0:
        from .textures import texture_value
        flag = row[:, pt.COL_FALLBACK] > 0.0
        tid = row[:, pt.COL_TID].astype(jnp.int32)
        fb_val = texture_value(data, meta, tid, uu, vv, p)
        attenuation = jnp.where(flag[:, None], fb_val, attenuation)
        if MAT_DIFFUSE_LIGHT in kinds_present:
            emission_color = jnp.where(
                (flag & (kind == MAT_DIFFUSE_LIGHT))[:, None], fb_val, emission_color)

    # emission: front faces only (materials.cuh:157-162)
    emission = jnp.where(front[:, None], emission_color, 0.0)

    skip_pdf = (kind == MAT_METAL) | (kind == MAT_DIELECTRIC)
    scatter_ok = kind != MAT_DIFFUSE_LIGHT

    # ---- specular branch (materials.cuh:73-130) ----
    skip_dir = jnp.zeros((R, 3), jnp.float32).at[:, 0].set(1.0)
    if MAT_METAL in kinds_present:
        refl = m3.reflect(rd, normal)
        fuzz = row[:, pt.COL_FUZZ]
        metal_dir = m3.unit(refl) + fuzz[:, None] * m3.unit_sphere_dir(f1, f2)
        skip_dir = jnp.where((kind == MAT_METAL)[:, None], metal_dir, skip_dir)
    if MAT_DIELECTRIC in kinds_present:
        ior = row[:, pt.COL_IOR]
        ratio = jnp.where(front, 1.0 / ior, ior)
        ud = m3.unit(rd)
        cos_theta = jnp.minimum(m3.dot(-ud, normal), 1.0)
        sin_theta = m3.safe_sqrt(1.0 - cos_theta * cos_theta)
        cannot = ratio * sin_theta > 1.0
        reflect_choice = cannot | (m3.schlick(cos_theta, ratio) > diel_u)
        d_dir = jnp.where(reflect_choice[:, None],
                          m3.reflect(ud, normal),
                          m3.refract(ud, normal, ratio))
        skip_dir = jnp.where((kind == MAT_DIELECTRIC)[:, None], d_dir, skip_dir)

    # ---- diffuse branch: cosine/sphere pdf + optional light MIS ----
    diffuse_present = kinds_present & {MAT_LAMBERTIAN, MAT_ISOTROPIC}
    if diffuse_present:
        bu, bv, bw = m3.onb_from_w(normal)
        mat_dir = m3.onb_local(bu, bv, bw, m3.cosine_dir(m1, m2))
        if MAT_ISOTROPIC in kinds_present:
            iso_dir = m3.unit_sphere_dir(m1, m2)
            mat_dir = jnp.where((kind == MAT_ISOTROPIC)[:, None], iso_dir, mat_dir)

        if meta.lights:
            light_dir = lights_sample(data, meta, p, pick_u, l1, l2)
            gen_dir = jnp.where((mix_u < 0.5)[:, None], light_dir, mat_dir)
            light_pdf = lights_pdf_value(data, meta, qf, p, gen_dir)
        else:
            gen_dir = mat_dir
            light_pdf = 0.0

        # One shared cosine feeds BOTH the sampling pdf (pdf.cuh:46-49) and
        # the scatter pdf (materials.cuh:52-55).  The reference computes them
        # separately but identically; computing them with different float
        # roundings makes the ratio spdf/pdf — mathematically exactly 1 in
        # no-light scenes — explode for grazing samples (tiny/tiny), which
        # was observed as >100x radiance outliers on TPU.
        cos_c = m3.dot(m3.unit(gen_dir), bw) / m3.PI
        mat_pdf = jnp.maximum(0.0, cos_c)
        if MAT_ISOTROPIC in kinds_present:
            mat_pdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, mat_pdf)
        pdf = 0.5 * light_pdf + 0.5 * mat_pdf if meta.lights else mat_pdf

        spdf = jnp.where(cos_c < 0.0, 0.0, cos_c)
        if MAT_ISOTROPIC in kinds_present:
            spdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, spdf)

        diffuse_weight = jnp.where(
            (pdf > 0.0)[:, None],
            attenuation * (spdf / jnp.where(pdf > 0, pdf, 1.0))[:, None],
            0.0)
    else:
        gen_dir = skip_dir
        diffuse_weight = jnp.zeros((R, 3), jnp.float32)

    weight = jnp.where(skip_pdf[:, None], attenuation, diffuse_weight)
    new_dir = jnp.where(skip_pdf[:, None], skip_dir, gen_dir)
    return BounceOut(hit=hit, p=p, emission=emission, weight=weight,
                     new_dir=new_dir, scatter_ok=scatter_ok, skip_pdf=skip_pdf)
