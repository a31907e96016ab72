"""Pre-joined per-primitive shading table.

The reference dereferences registries at every bounce: hit -> material
(mat_type, mat_idx) -> texture (texType, texIdx) -> color, through switch
dispatchers (objects.cuh:858-887, materials.cuh:272-349,
textures.cuh:327-349).  On TPU each of those is a slow vector gather, and
the shade pass was measured gather-bound.

This module *joins* the registries at trace time into one flat
[n_prims, K] float table so the whole hit -> shading-attribute chain is a
SINGLE gather per bounce.  The join is built with jnp ops from the
differentiable source arrays (mat_albedo, tex_color, ...), so scene
gradients flow through it unchanged.

Checker textures with solid-color children are folded into two color
columns + an inverse scale (the parity select needs no dispatch at all:
inv_scale = 0 makes every point "even").  Image/noise textures (and other
non-bakeable cases) set a fallback flag column; shading evaluates
textures.texture_value only for those rays, only in scenes that have them.

Column layout (K = 27):
  0:3   A        base color (lambertian/isotropic solid or checker-even,
                 metal albedo, dielectric white)
  3:6   B        checker-odd color (== A for non-checker)
  6     INVSC    checker inverse scale (0 = no checker)
  7     FUZZ     metal fuzz
  8     IOR      dielectric index
  9     KIND     material kind tag (float)
  10    TID      texture row (for fallback eval)
  11    FALLBACK 1.0 when texture needs full texture_value eval
  12:15 E        emission color (diffuse_light, solid only; fallback flag
                 covers fancy emitters)
  15    (pad)
  16:19 G0       sphere center        | quad unit normal
  19:22 G1       sphere center_vec    | quad v x w
  22:25 G2       0                    | quad w x u
  25    S0       sphere radius        | quad Q.(v x w)
  26    S1       0                    | quad Q.(w x u)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.build import SceneData, SceneMeta
from ..scene.types import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_METAL, TEX_CHECKER, TEX_SOLID,
)
from .intersect import QuadFrames

K = 27
COL_A = 0
COL_B = 3
COL_INVSC = 6
COL_FUZZ = 7
COL_IOR = 8
COL_KIND = 9
COL_TID = 10
COL_FALLBACK = 11
COL_E = 12
COL_G0 = 16
COL_G1 = 19
COL_G2 = 22
COL_S0 = 25
COL_S1 = 26


def material_columns(data: SceneData, meta: SceneMeta):
    """[M, 16] material/texture columns of the join (differentiable)."""
    M = len(meta.mat_kind)
    kind = jnp.asarray(meta.mat_kind, jnp.int32)
    tex_kind = jnp.asarray(meta.tex_kind, jnp.int32)

    tid = data.mat_tex[:M]
    tkind = tex_kind[tid]
    solid = data.tex_color[tid]
    even_col = data.tex_color[data.tex_child_even[tid]]
    odd_col = data.tex_color[data.tex_child_odd[tid]]
    child_kinds_solid = ((tex_kind[data.tex_child_even[tid]] == TEX_SOLID)
                         & (tex_kind[data.tex_child_odd[tid]] == TEX_SOLID))

    is_checker = (tkind == TEX_CHECKER) & child_kinds_solid
    fallback = ((tkind != TEX_SOLID) & ~is_checker).astype(jnp.float32)
    # metal/dielectric ignore textures entirely
    uses_tex = (kind != MAT_METAL) & (kind != MAT_DIELECTRIC)
    fallback = jnp.where(uses_tex, fallback, 0.0)

    A = jnp.where(is_checker[:, None], even_col, solid)
    A = jnp.where((kind == MAT_METAL)[:, None], data.mat_albedo[:M], A)
    A = jnp.where((kind == MAT_DIELECTRIC)[:, None], 1.0, A)
    B = jnp.where(is_checker[:, None], odd_col, A)
    invsc = jnp.where(is_checker & uses_tex, data.tex_inv_scale[tid], 0.0)
    E = jnp.where((kind == MAT_DIFFUSE_LIGHT)[:, None], solid, 0.0)

    cols = jnp.zeros((M, 16), jnp.float32)
    cols = cols.at[:, COL_A:COL_A + 3].set(A)
    cols = cols.at[:, COL_B:COL_B + 3].set(B)
    cols = cols.at[:, COL_INVSC].set(invsc)
    cols = cols.at[:, COL_FUZZ].set(data.mat_fuzz[:M])
    cols = cols.at[:, COL_IOR].set(data.mat_ior[:M])
    cols = cols.at[:, COL_KIND].set(kind.astype(jnp.float32))
    cols = cols.at[:, COL_TID].set(tid.astype(jnp.float32))
    cols = cols.at[:, COL_FALLBACK].set(fallback)
    cols = cols.at[:, COL_E:COL_E + 3].set(E)
    return cols


def build_prim_table(data: SceneData, meta: SceneMeta, qf: QuadFrames):
    """Join materials+textures+geometry into one [Ns_pad+Nq_pad, K] table.

    Global prim index g = sphere_row, or Ns_pad + quad_row.
    Returns (table, mat_cols) — mat_cols is reused for media overrides.
    """
    mat_cols = material_columns(data, meta)
    Ns = data.sph_center.shape[0]
    Nq = data.quad_Q.shape[0]

    sph = jnp.zeros((Ns, K), jnp.float32)
    sph = sph.at[:, :16].set(mat_cols[data.sph_mat])
    sph = sph.at[:, COL_G0:COL_G0 + 3].set(data.sph_center)
    sph = sph.at[:, COL_G1:COL_G1 + 3].set(data.sph_cvec)
    sph = sph.at[:, COL_S0].set(data.sph_radius)

    qd = jnp.zeros((Nq, K), jnp.float32)
    qd = qd.at[:, :16].set(mat_cols[data.quad_mat])
    qd = qd.at[:, COL_G0:COL_G0 + 3].set(qf.normal)
    qd = qd.at[:, COL_G1:COL_G1 + 3].set(qf.vxw)
    qd = qd.at[:, COL_G2:COL_G2 + 3].set(qf.wxu)
    qd = qd.at[:, COL_S0].set(qf.qa)
    qd = qd.at[:, COL_S1].set(qf.qb)

    return jnp.concatenate([sph, qd], axis=0), mat_cols
