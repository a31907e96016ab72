"""Batched ray-scene intersection.

The reference's sequential closest-hit loop over tagged registries
(world.cuh:105-171) plus dispatchers (objects.cuh:858-887) becomes a fully
vectorised min-reduction, reformulated so the inner products feed the MXU:

* Sphere quadratic terms (objects.cuh:61-88) are expanded so that all
  ray-x-primitive coupling appears as [R,3] @ [3,C] matmuls (ro.center,
  rd.center, and the motion-blur terms), with the remaining work elementwise
  on [R,C] tiles — no [R,C,3] tensor is ever materialised.

* Quad plane/basis tests (objects.cuh:190-215) use the identities
  alpha = (p-Q).(v x w),  beta = (p-Q).(w x u), so they also reduce to
  [R,3] @ [3,C] matmuls against precomputed per-quad frames.

* Constant media (objects.cuh:396-434) are resolved after all surfaces in
  registry order with a running closest-t; this is provably equivalent to
  the reference's interleaved loop order (the free-flight acceptance test is
  monotone in t_max, so any sample rejected by our tighter clamp would have
  lost the closest-hit comparison anyway).

Closest-hit ties resolve to the earlier registry (sphere < quad < media),
matching the reference's strict `t < closest_so_far` update rule.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..scene.build import SceneData, SceneMeta
from ..scene.types import OBJ_QUAD, OBJ_SPHERE
from .. import rng as rngm
from . import math3 as m3

INF = jnp.float32(jnp.inf)

# TPU's DEFAULT dot precision is a single bf16 pass; at scene coordinate
# scales (|ro||c| ~ 1e6) that fakes geometry (see pallas_intersect.DOT_PREC).
# All closest-hit matmuls go through _mm so CPU and TPU agree at f32.
import jax as _jax


def _mm(a, b):
    return jnp.matmul(a, b, precision=_jax.lax.Precision.HIGHEST)
T_MIN = 1e-3          # world-level epsilon (camera.cuh:97)
MEDIUM_EPS = 1e-4     # boundary re-hit epsilon (objects.cuh:404)
UV_CLAMP = 1.0 - 2.0 ** -20   # arccos domain clamp (gradient safety)

# best-hit kind codes
K_NONE = 0
K_SPHERE = 1
K_QUAD = 2
K_MEDIUM0 = 3


@struct.dataclass
class QuadFrames:
    """Per-quad derived quantities (objects.cuh:170-185), computed in-trace
    from Q/u/v so quad gradients flow."""
    normal: Any   # [Nq,3] unit
    D: Any        # [Nq]
    vxw: Any      # [Nq,3] cross(v, w)
    wxu: Any      # [Nq,3] cross(w, u)
    qa: Any       # [Nq] Q . vxw
    qb: Any       # [Nq] Q . wxu
    area: Any     # [Nq] |cross(u,v)|


@struct.dataclass
class Hit:
    hit: Any         # [R] bool
    t: Any           # [R]
    p: Any           # [R,3]
    normal: Any      # [R,3] front-face adjusted (hit_record.cuh:20-23)
    front_face: Any  # [R] bool
    u: Any           # [R]
    v: Any           # [R]
    mat: Any         # [R] i32 global material row


def quad_frames(data: SceneData) -> QuadFrames:
    n = m3.cross(data.quad_u, data.quad_v)
    nn = m3.dot(n, n)[..., None]
    normal = n / jnp.sqrt(nn)
    w = n / nn
    vxw = m3.cross(data.quad_v, w)
    wxu = m3.cross(w, data.quad_u)
    return QuadFrames(
        normal=normal,
        D=m3.dot(normal, data.quad_Q),
        vxw=vxw,
        wxu=wxu,
        qa=m3.dot(data.quad_Q, vxw),
        qb=m3.dot(data.quad_Q, wxu),
        area=jnp.sqrt(m3.dot(n, n)),
    )


def _chunk_bounds(n_rows, n_valid, chunk):
    """Static chunking plan: list of (start, size) covering n_rows."""
    out = []
    start = 0
    while start < n_rows:
        size = min(chunk, n_rows - start)
        if start < n_valid:  # skip all-padding chunks
            out.append((start, size))
        start += size
    return out


def sphere_pass(data: SceneData, meta: SceneMeta, ro, rd, time, t_min,
                best_t, best_idx, chunk=512):
    """Closest sphere hit (objects.cuh:61-88 batched). Returns (t, idx)."""
    n_rows = data.sph_center.shape[0]
    if meta.n_spheres == 0:
        return best_t, best_idx

    a = m3.length_sq(rd)                       # [R]
    ro_rd = m3.dot(ro, rd)                     # [R]
    ro_sq = m3.length_sq(ro)                   # [R]

    for start, size in _chunk_bounds(n_rows, meta.n_spheres, chunk):
        c = data.sph_center[start:start + size]
        surf = data.sph_surface[start:start + size]
        r = data.sph_radius[start:start + size]
        rdc = _mm(rd, c.T)                          # [R,C]
        roc = _mm(ro, c.T)
        ctc = jnp.sum(c * c, axis=-1)           # [C]
        if meta.any_moving:
            cv = data.sph_cvec[start:start + size]
            rdv = _mm(rd, cv.T)
            rov = _mm(ro, cv.T)
            ccv = jnp.sum(c * cv, axis=-1)
            vv = jnp.sum(cv * cv, axis=-1)
            tcol = time[:, None]
            half_b = ro_rd[:, None] - rdc - tcol * rdv
            c_term = (ro_sq[:, None] - 2.0 * roc - 2.0 * tcol * rov
                      + ctc[None, :] + 2.0 * tcol * ccv[None, :]
                      + tcol * tcol * vv[None, :] - (r * r)[None, :])
        else:
            half_b = ro_rd[:, None] - rdc
            c_term = ro_sq[:, None] - 2.0 * roc + (ctc - r * r)[None, :]

        disc = half_b * half_b - a[:, None] * c_term
        sq = m3.safe_sqrt(disc)
        inv_a = 1.0 / a[:, None]
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        # nearest root in range (objects.cuh:72-77) with t_max = +inf
        root = jnp.where(root1 > t_min, root1, root2)
        valid = (disc >= 0.0) & (root > t_min) & surf[None, :]
        cand = jnp.where(valid, root, INF)
        ct = jnp.min(cand, axis=-1)
        ci = jnp.argmin(cand, axis=-1).astype(jnp.int32) + start
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_idx = jnp.where(better, ci, best_idx)
    return best_t, best_idx


def quad_pass(data: SceneData, meta: SceneMeta, qf: QuadFrames, ro, rd, t_min,
              best_t, best_idx, chunk=512):
    """Closest quad hit (objects.cuh:190-215 batched). Returns (t, idx)."""
    n_rows = data.quad_Q.shape[0]
    if meta.n_quads == 0:
        return best_t, best_idx

    for start, size in _chunk_bounds(n_rows, meta.n_quads, chunk):
        nrm = qf.normal[start:start + size]
        surf = data.quad_surface[start:start + size]
        denom = _mm(rd, nrm.T)                              # [R,C]
        ok_denom = jnp.abs(denom) >= 1e-8
        denom_safe = jnp.where(ok_denom, denom, 1.0)
        t = jnp.where(ok_denom,
                      (qf.D[None, start:start + size] - _mm(ro, nrm.T)) / denom_safe,
                      -1.0)
        a1 = _mm(ro, qf.vxw[start:start + size].T)
        a2 = _mm(rd, qf.vxw[start:start + size].T)
        alpha = a1 + t * a2 - qf.qa[None, start:start + size]
        b1 = _mm(ro, qf.wxu[start:start + size].T)
        b2 = _mm(rd, qf.wxu[start:start + size].T)
        beta = b1 + t * b2 - qf.qb[None, start:start + size]
        valid = (
            ok_denom
            & (t > t_min)
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0)
            & surf[None, :]
        )
        cand = jnp.where(valid, t, INF)
        ct = jnp.min(cand, axis=-1)
        ci = jnp.argmin(cand, axis=-1).astype(jnp.int32) + start
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_idx = jnp.where(better, ci, best_idx)
    return best_t, best_idx


def _sphere_roots_single(data, row, ro, rd):
    """Both quadratic roots of one sphere over (-inf, inf), for media
    boundaries (objects.cuh:400-404).  Static spheres only: reference media
    wrap non-moving boundaries (center(time) ignored for cvec=0).
    ro/rd are SoA V3 (render/vec.py)."""
    from . import vec as v3
    c = data.sph_center[row]
    r = data.sph_radius[row]
    oc = ro - v3.V3(c[0], c[1], c[2])
    a = v3.length_sq(rd)
    half_b = v3.dot(oc, rd)
    c_term = v3.length_sq(oc) - r * r
    disc = half_b * half_b - a * c_term
    sq = v3.safe_sqrt(disc)
    ok = disc >= 0.0
    root1 = (-half_b - sq) / a
    root2 = (-half_b + sq) / a
    return [(root1, ok), (root2, ok)]


def _quad_t_single(data, qf: QuadFrames, row, ro, rd):
    """One quad's plane hit over (-inf, inf) for media boundaries (SoA)."""
    from . import vec as v3
    nrm = qf.normal[row]
    nrm = v3.V3(nrm[0], nrm[1], nrm[2])
    vxw = qf.vxw[row]
    vxw = v3.V3(vxw[0], vxw[1], vxw[2])
    wxu = qf.wxu[row]
    wxu = v3.V3(wxu[0], wxu[1], wxu[2])
    denom = v3.dot(rd, nrm)
    ok_denom = jnp.abs(denom) >= 1e-8
    t = jnp.where(ok_denom,
                  (qf.D[row] - v3.dot(ro, nrm))
                  / jnp.where(ok_denom, denom, 1.0),
                  -1.0)
    alpha = v3.dot(ro, vxw) + t * v3.dot(rd, vxw) - qf.qa[row]
    beta = v3.dot(ro, wxu) + t * v3.dot(rd, wxu) - qf.qb[row]
    ok = ok_denom & (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1)
    return [(t, ok)]


def media_pass(data: SceneData, meta: SceneMeta, qf: QuadFrames, ro, rd,
               seed, pixel, sample, bounce, t_min, best_t, best_kind, best_idx):
    """Constant media free-flight sampling (objects.cuh:396-434), evaluated
    after all surfaces with a running closest-t (see module docstring).
    ro/rd are SoA V3."""
    from . import vec as v3
    # ONE philox block serves up to 4 media (medium m reads word m) —
    # integer-multiply-heavy philox blocks are among the costliest
    # per-bounce ops on the TPU VPU, and media draws are independent words.
    u_media = rngm.uniform4(seed, pixel, sample, 1 + bounce,
                            rngm.SLOT_MEDIUM0) if meta.media else ()
    for m, med in enumerate(meta.media):
        cands = []
        for row in med.sphere_rows:
            cands += _sphere_roots_single(data, row, ro, rd)
        for row in med.quad_rows:
            cands += _quad_t_single(data, qf, row, ro, rd)
        # few candidates (media wrap 1-6 faces): pairwise mins, no [R,K] stack
        t1 = None
        for t, ok in cands:
            c = jnp.where(ok, t, INF)
            t1 = c if t1 is None else jnp.minimum(t1, c)
        found1 = jnp.isfinite(t1)
        t2 = None
        for t, ok in cands:
            c = jnp.where(ok & (t > t1 + MEDIUM_EPS), t, INF)
            t2 = c if t2 is None else jnp.minimum(t2, c)
        found2 = jnp.isfinite(t2)

        rec1 = jnp.maximum(t1, t_min)
        rec2 = jnp.minimum(t2, best_t)
        ok = found1 & found2 & (rec1 < rec2)
        rec1 = jnp.maximum(rec1, 0.0)

        ray_len = v3.length(rd)
        dist_inside = (rec2 - rec1) * ray_len
        u_m = u_media[m]
        # u=0 maps to log->-inf in the reference (rejected sample); floor it
        # so reverse-mode AD through rejected lanes stays finite.
        hit_dist = data.med_neg_inv_density[m] * jnp.log(jnp.maximum(u_m, 1e-37))
        accept = ok & (hit_dist <= dist_inside)
        t_med = rec1 + hit_dist / ray_len

        best_t = jnp.where(accept, t_med, best_t)
        best_kind = jnp.where(accept, K_MEDIUM0 + m, best_kind)
        best_idx = jnp.where(accept, m, best_idx)
    return best_t, best_kind, best_idx


def finalize_hit(data: SceneData, meta: SceneMeta, qf: QuadFrames, ro, rd, time,
                 best_t, best_kind, best_idx) -> Hit:
    """Gather the winning primitive's shading attributes (one per ray)."""
    hit = best_kind != K_NONE
    t = jnp.where(hit, best_t, 1.0)
    p = ro + t[:, None] * rd

    R = ro.shape[0]
    normal = jnp.zeros_like(ro).at[:, 0].set(1.0)
    front = jnp.ones(R, bool)
    uu = jnp.zeros(R, jnp.float32)
    vv = jnp.zeros(R, jnp.float32)
    mat = jnp.zeros(R, jnp.int32)

    if meta.n_spheres > 0:
        i = jnp.clip(best_idx, 0, data.sph_center.shape[0] - 1)
        c = data.sph_center[i] + time[:, None] * data.sph_cvec[i]
        r = data.sph_radius[i]
        r_safe = jnp.where(r != 0.0, r, 1.0)
        outward = (p - c) / r_safe[:, None]
        s_front = m3.dot(rd, outward) < 0.0
        s_normal = jnp.where(s_front[:, None], outward, -outward)
        # compute_uv (objects.cuh:101-108); arccos argument clamped one ulp
        # inside (-1,1) so pole gradients stay finite (UV_CLAMP, also used by
        # the oracle for bit-parity).
        theta = jnp.arccos(jnp.clip(-outward[:, 1], -UV_CLAMP, UV_CLAMP))
        phi = jnp.arctan2(-outward[:, 2], outward[:, 0]) + m3.PI
        sel = best_kind == K_SPHERE
        normal = jnp.where(sel[:, None], s_normal, normal)
        front = jnp.where(sel, s_front, front)
        uu = jnp.where(sel, phi / (2.0 * m3.PI), uu)
        vv = jnp.where(sel, theta / m3.PI, vv)
        mat = jnp.where(sel, data.sph_mat[i], mat)

    if meta.n_quads > 0:
        i = jnp.clip(best_idx, 0, data.quad_Q.shape[0] - 1)
        nrm = qf.normal[i]
        rel = p - data.quad_Q[i]
        alpha = m3.dot(rel, qf.vxw[i])
        beta = m3.dot(rel, qf.wxu[i])
        q_front = m3.dot(rd, nrm) < 0.0
        q_normal = jnp.where(q_front[:, None], nrm, -nrm)
        sel = best_kind == K_QUAD
        normal = jnp.where(sel[:, None], q_normal, normal)
        front = jnp.where(sel, q_front, front)
        uu = jnp.where(sel, alpha, uu)
        vv = jnp.where(sel, beta, vv)
        mat = jnp.where(sel, data.quad_mat[i], mat)

    for m, med in enumerate(meta.media):
        # arbitrary normal/front_face (objects.cuh:428-429)
        sel = best_kind == K_MEDIUM0 + m
        normal = jnp.where(sel[:, None], jnp.array([1.0, 0.0, 0.0]), normal)
        front = jnp.where(sel, True, front)
        uu = jnp.where(sel, 0.0, uu)
        vv = jnp.where(sel, 0.0, vv)
        mat = jnp.where(sel, med.mat_row, mat)

    return Hit(hit=hit, t=t, p=p, normal=normal, front_face=front, u=uu, v=vv, mat=mat)


def intersect_best(data: SceneData, meta: SceneMeta, qf: QuadFrames,
                   ro, rd, time, seed, pixel, sample, bounce, chunk=512):
    """world::hit closest-hit search only: returns (best_t, best_kind,
    best_idx) without gathering shading attributes."""
    R = ro.shape[0]
    best_t = jnp.full(R, INF)
    best_idx = jnp.zeros(R, jnp.int32)

    sph_t, sph_i = sphere_pass(data, meta, ro, rd, time, T_MIN, best_t, best_idx, chunk)
    qt, qi = quad_pass(data, meta, qf, ro, rd, T_MIN, jnp.full(R, INF),
                       jnp.zeros(R, jnp.int32), chunk)

    # merge (spheres win ties: world.cuh loop order)
    q_better = qt < sph_t
    best_t = jnp.where(q_better, qt, sph_t)
    best_kind = jnp.where(q_better, K_QUAD, jnp.where(jnp.isfinite(sph_t), K_SPHERE, K_NONE))
    best_idx = jnp.where(q_better, qi, sph_i)

    if meta.media:
        from .vec import V3
        best_t, best_kind, best_idx = media_pass(
            data, meta, qf, V3.from_rows(ro), V3.from_rows(rd),
            seed, pixel, sample, bounce, T_MIN, best_t, best_kind, best_idx)

    return best_t, best_kind, best_idx


def intersect_world(data: SceneData, meta: SceneMeta, qf: QuadFrames,
                    ro, rd, time, seed, pixel, sample, bounce,
                    chunk=512) -> Hit:
    """Full world::hit (world.cuh:105-171) over a ray batch."""
    best_t, best_kind, best_idx = intersect_best(
        data, meta, qf, ro, rd, time, seed, pixel, sample, bounce, chunk)
    return finalize_hit(data, meta, qf, ro, rd, time, best_t, best_kind, best_idx)
