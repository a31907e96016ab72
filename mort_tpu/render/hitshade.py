"""Fused hit-finalize + shading over the joined primitive table.

Replaces the gather-heavy finalize_hit + shade pair with a single
[R]-gather from the primtable join followed by pure elementwise work.
Semantics are identical to the reference dispatch chain (emitDispatch /
scatterDispatch / scatterPdfDispatch + mixture PDF, camera.cuh:96-159,
materials.cuh:272-349) — verified against the CPU oracle.

All vector state is structure-of-arrays (render/vec.py): three flat [R]
component arrays per vector, so the entire shade pass is elementwise VPU
work on exactly-tiled blocks, with no [R,3] lane-padding waste and no
cross-lane dot-product reductions.
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
from . import primtable as pt
from . import vec as v3
from .vec import V3
from .intersect import K_MEDIUM0, K_NONE, K_QUAD, K_SPHERE, QuadFrames
from .shade import lights_pdf_value, lights_sample

PI = v3.PI
INV_4PI = 1.0 / (4.0 * PI)
UV_CLAMP = 1.0 - 2.0 ** -20


@struct.dataclass
class BounceOut:
    hit: Any         # [R] bool
    p: Any           # V3
    emission: Any    # V3
    weight: Any      # V3
    new_dir: Any     # V3
    scatter_ok: Any  # [R] bool
    skip_pdf: Any    # [R] bool
    # defer_tex mode only (None otherwise): lanes whose fallback-texture
    # factor was left OUT of ``weight`` — the caller owes beta a multiply
    # by texture_value(tex_tid, tex_u, tex_v, p) before the lane's next
    # radiance contribution (wavefront stall-resolve machinery).
    tex_pending: Any = None   # [R] bool
    tex_u: Any = None         # [R]
    tex_v: Any = None         # [R]
    tex_tid: Any = None       # [R] i32


def finalize_and_shade(data: SceneData, meta: SceneMeta, qf: QuadFrames,
                       table, mat_cols, ro: V3, rd: V3, time, best_t,
                       best_kind, best_idx, seed, pixel, sample, bounce,
                       row_t=None, defer_tex=False) -> BounceOut:
    """``row_t``: optional precomputed [32, R] *transposed* joined rows (the
    pallas kernel emits them via an in-VMEM one-hot matmul, ray-minor so
    each column read below is a contiguous [R] slice); when None, gathered
    here from ``table``.

    ``defer_tex``: skip the fallback texture evaluation (image gathers +
    perlin octaves — measured 34% of the scene-8 wavefront round when run
    for every lane every bounce) and instead report flagged lanes via
    BounceOut.tex_pending/tex_u/tex_v/tex_tid with attenuation 1; the
    caller multiplies texture_value into beta later (the wavefront does it
    once per deposit round over stalled lanes).  Only valid when no
    emissive material carries a fallback texture (the caller checks —
    emission would need the texel immediately)."""
    R = best_t.shape[0]
    Ns = data.sph_center.shape[0]
    hit = best_kind != K_NONE

    if row_t is None:
        # ---- THE gather: one row of the joined table per ray ----
        g = jnp.where(best_kind == K_QUAD, best_idx + Ns, best_idx)
        g = jnp.clip(g, 0, table.shape[0] - 1)
        row = table[g]                   # [R, K]

        def col(i):
            return row[:, i]
    else:
        def col(i):
            return row_t[i]

    # media override rows (few, static)
    if meta.media:
        med_sel = []
        for m, med in enumerate(meta.media):
            med_sel.append((best_kind == K_MEDIUM0 + m, mat_cols[med.mat_row]))
        base_col = col

        def col(i):
            out = base_col(i)
            for sel, mrow in med_sel:
                if i < 16:
                    out = jnp.where(sel, mrow[i], out)
            return out

    def colv(i):
        return V3(col(i), col(i + 1), col(i + 2))

    t = jnp.where(hit, best_t, 1.0)
    p = ro + rd * t

    is_sphere = best_kind == K_SPHERE
    is_quad = best_kind == K_QUAD
    is_medium = best_kind >= K_MEDIUM0

    g0 = colv(pt.COL_G0)
    g1 = colv(pt.COL_G1)
    g2 = colv(pt.COL_G2)
    s0 = col(pt.COL_S0)
    s1 = col(pt.COL_S1)

    # ---- geometry / normals (objects.cuh:79-86, 206-213, 428-429) ----
    if meta.any_moving:
        c_t = g0 + g1 * time
    else:
        c_t = g0
    r_safe = jnp.where(is_sphere & (s0 != 0.0), s0, 1.0)
    outward = (p - c_t) / r_safe         # sphere outward normal
    n_raw = v3.where(is_sphere, outward, g0)  # quad unit normal in G0
    front = v3.dot(rd, n_raw) < 0.0
    normal = v3.where(front, n_raw, -n_raw)
    # media: arbitrary fixed normal/front (objects.cuh:428-429)
    if meta.media:
        normal = v3.where(is_medium, V3.full_like(normal.x, 1.0, 0.0, 0.0),
                          normal)
        front = jnp.where(is_medium, True, front)

    # ---- uv (only needed for image textures; quads get alpha/beta free) ----
    if meta.n_images > 0:
        theta = jnp.arccos(jnp.clip(-outward.y, -UV_CLAMP, UV_CLAMP))
        phi = jnp.arctan2(-outward.z, outward.x) + PI
        su = phi / (2.0 * PI)
        sv = theta / PI
        alpha_q = v3.dot(p, g1) - s0
        beta_q = v3.dot(p, g2) - s1
        uu = jnp.where(is_quad, alpha_q, jnp.where(is_sphere, su, 0.0))
        vv = jnp.where(is_quad, beta_q, jnp.where(is_sphere, sv, 0.0))
    else:
        uu = jnp.zeros(R, jnp.float32)
        vv = jnp.zeros(R, jnp.float32)

    kind = col(pt.COL_KIND).astype(jnp.int32)
    kinds_present = set(meta.mat_kind)

    # ---- RNG draws (scene-gated: counter-based slots mean skipping a slot
    # that no material in the scene consumes cannot perturb the others, so
    # unused philox blocks are simply not computed) ----
    diffuse_present = kinds_present & {MAT_LAMBERTIAN, MAT_ISOTROPIC}
    if meta.lights or MAT_DIELECTRIC in kinds_present:
        mix_u, pick_u, diel_u, _ = rngm.uniform4(seed, pixel, sample,
                                                 1 + bounce, rngm.SLOT_MIX)
    else:
        mix_u = pick_u = diel_u = jnp.zeros(R, jnp.float32)
    if diffuse_present:
        m1, m2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce,
                                     rngm.SLOT_MAT_DIR)
    else:
        m1 = m2 = jnp.zeros(R, jnp.float32)
    if meta.lights:
        l1, l2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce,
                                     rngm.SLOT_LIGHT_DIR)
    if MAT_METAL in kinds_present:
        f1, f2, _, _ = rngm.uniform4(seed, pixel, sample, 1 + bounce,
                                     rngm.SLOT_FUZZ)

    # ---- attenuation: baked solid/checker (textures.cuh:24-60) ----
    invsc = col(pt.COL_INVSC)
    gx = jnp.floor(invsc * p.x).astype(jnp.int32)
    gy = jnp.floor(invsc * p.y).astype(jnp.int32)
    gz = jnp.floor(invsc * p.z).astype(jnp.int32)
    is_even = (gx + gy + gz) % 2 == 0
    attenuation = v3.where(is_even, colv(pt.COL_A), colv(pt.COL_B))
    emission_color = colv(pt.COL_E)

    # ---- fallback textures (image/noise/non-bakeable) ----
    tex_pending = tex_tid = None
    if meta.n_images > 0 or meta.n_noise > 0:
        flag = col(pt.COL_FALLBACK) > 0.0
        tid = col(pt.COL_TID).astype(jnp.int32)
        if defer_tex:
            # texel factor owed to beta by the caller; attenuation 1 here
            attenuation = v3.where(flag, 1.0, attenuation)
            tex_pending, tex_tid = flag & hit, tid
        else:
            from .textures import texture_value
            fb_val = V3.from_rows(texture_value(data, meta, tid, uu, vv,
                                                p.to_rows()))
            attenuation = v3.where(flag, fb_val, attenuation)
            if MAT_DIFFUSE_LIGHT in kinds_present:
                emission_color = v3.where(flag & (kind == MAT_DIFFUSE_LIGHT),
                                          fb_val, emission_color)

    # emission: front faces only (materials.cuh:157-162)
    emission = v3.where(front, emission_color, 0.0)

    skip_pdf = (kind == MAT_METAL) | (kind == MAT_DIELECTRIC)
    scatter_ok = kind != MAT_DIFFUSE_LIGHT

    # ---- specular branch (materials.cuh:73-130) ----
    skip_dir = V3.full_like(t, 1.0, 0.0, 0.0)
    if MAT_METAL in kinds_present:
        refl = v3.reflect(rd, normal)
        fuzz = col(pt.COL_FUZZ)
        metal_dir = v3.unit(refl) + v3.unit_sphere_dir(f1, f2) * fuzz
        skip_dir = v3.where(kind == MAT_METAL, metal_dir, skip_dir)
    if MAT_DIELECTRIC in kinds_present:
        is_diel = kind == MAT_DIELECTRIC
        # Sanitize INPUTS into the branch, not just the output select:
        # non-dielectric and miss lanes reach here with garbage state (the
        # miss-lane row gather clips to row 0, whose G0 "normal" is an
        # unnormalised sphere center; ior is 0 on non-dielectric rows), and
        # a single inf/NaN in the discarded branch poisons reverse-mode
        # through the 0-cotangent x inf product (observed as NaN
        # d(loss)/d(ior) on the cornell glass sphere).
        ior = jnp.where(is_diel, col(pt.COL_IOR), 1.0)
        d_norm = v3.where(is_diel, normal, V3.full_like(t, 1.0, 0.0, 0.0))
        ratio = jnp.where(front, 1.0 / ior, ior)
        ud = v3.unit(v3.where(is_diel, rd, V3.full_like(t, -1.0, 0.0, 0.0)))
        cos_theta = jnp.minimum(v3.dot(-ud, d_norm), 1.0)
        sin_theta = v3.safe_sqrt(1.0 - cos_theta * cos_theta)
        cannot = ratio * sin_theta > 1.0
        reflect_choice = cannot | (v3.schlick(cos_theta, ratio) > diel_u)
        d_dir = v3.where(reflect_choice,
                         v3.reflect(ud, d_norm),
                         v3.refract(ud, d_norm, ratio))
        skip_dir = v3.where(is_diel, d_dir, skip_dir)

    # ---- diffuse branch: cosine/sphere pdf + optional light MIS ----
    if diffuse_present:
        bu, bv, bw = v3.onb_from_w(normal)
        mat_dir = v3.onb_local(bu, bv, bw, v3.cosine_dir(m1, m2))
        if MAT_ISOTROPIC in kinds_present:
            iso_dir = v3.unit_sphere_dir(m1, m2)
            mat_dir = v3.where(kind == MAT_ISOTROPIC, iso_dir, mat_dir)

        if meta.lights:
            light_dir = lights_sample(data, meta, p, pick_u, l1, l2)
            gen_dir = v3.where(mix_u < 0.5, light_dir, mat_dir)
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
        cos_c = v3.dot(v3.unit(gen_dir), bw) / PI
        mat_pdf = jnp.maximum(0.0, cos_c)
        if MAT_ISOTROPIC in kinds_present:
            mat_pdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, mat_pdf)
        pdf = 0.5 * light_pdf + 0.5 * mat_pdf if meta.lights else mat_pdf

        spdf = jnp.where(cos_c < 0.0, 0.0, cos_c)
        if MAT_ISOTROPIC in kinds_present:
            spdf = jnp.where(kind == MAT_ISOTROPIC, INV_4PI, spdf)

        ratio_w = jnp.where(pdf > 0.0,
                            spdf / jnp.where(pdf > 0, pdf, 1.0), 0.0)
        diffuse_weight = attenuation * ratio_w
    else:
        gen_dir = skip_dir
        diffuse_weight = V3.zeros(R)

    weight = v3.where(skip_pdf, attenuation, diffuse_weight)
    new_dir = v3.where(skip_pdf, skip_dir, gen_dir)
    return BounceOut(hit=hit, p=p, emission=emission, weight=weight,
                     new_dir=new_dir, scatter_ok=scatter_ok,
                     skip_pdf=skip_pdf, tex_pending=tex_pending,
                     tex_u=uu if tex_pending is not None else None,
                     tex_v=vv if tex_pending is not None else None,
                     tex_tid=tex_tid)
