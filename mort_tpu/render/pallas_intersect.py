"""Pallas TPU kernel: fused closest-hit over spheres + quads.

The XLA formulation of the batched intersection (intersect.py) materialises
[R, C] intermediates in HBM (the matmul outputs and the elementwise
quadratic terms) — measured bandwidth-bound at ~15 ms per 512K rays x 488
spheres.  This kernel tiles rays (TR per grid step) and primitives (CK per
inner loop step), keeps every [TR, CK] tile in VMEM, feeds the ray-primitive
inner products to the MXU, and writes only the [R] closest-hit results:
HBM traffic drops from ~20 KB/ray to ~50 B/ray.

Inputs are packed tables (pack_spheres/pack_quads):
  sphere row: cx cy cz (ctc - r^2) cvx cvy cvz c.cv |cv|^2 surf pad pad
  quad row:   nx ny nz D vxw(3) qa wxu(3) qb surf pad pad pad

Math parity with objects.cuh:61-88 (sphere) / 190-215 (quad); closest-hit
tie rules match world.cuh:105-171 (earlier row wins within a kind; sphere
beats quad on exact ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import K_NONE, K_QUAD, K_SPHERE

TR = 1024     # rays per grid step
CK = 512      # primitives per inner loop step
NEG_BIG = -1e30
BIG = 3.0e38  # python literal: jnp scalars would be captured consts in the kernel


def _round_up(x, m):
    return -(-x // m) * m


def pack_spheres(data, meta):
    """[12, Cpad] f32 transposed sphere table (differentiable, in-trace).
    Transposed layout keeps every in-kernel access a contiguous slice —
    Mosaic has no general gather."""
    n_rows = data.sph_center.shape[0]
    cpad = _round_up(max(n_rows, CK), CK)
    c = data.sph_center
    r = data.sph_radius
    cv = data.sph_cvec
    ctc_r2 = jnp.sum(c * c, -1) - r * r
    rows = [c[:, 0], c[:, 1], c[:, 2], ctc_r2,
            cv[:, 0], cv[:, 1], cv[:, 2], jnp.sum(c * cv, -1),
            jnp.sum(cv * cv, -1),
            data.sph_surface.astype(jnp.float32),
            jnp.zeros(n_rows), jnp.zeros(n_rows)]
    tbl = jnp.stack(rows, axis=0)
    return jnp.pad(tbl, ((0, 0), (0, cpad - n_rows)))


def pack_quads(data, meta, qf):
    """[16, Qpad] f32 transposed quad table."""
    n_rows = data.quad_Q.shape[0]
    qpad = _round_up(max(n_rows, CK), CK)
    z = jnp.zeros(n_rows)
    rows = [qf.normal[:, 0], qf.normal[:, 1], qf.normal[:, 2], qf.D,
            qf.vxw[:, 0], qf.vxw[:, 1], qf.vxw[:, 2], qf.qa,
            qf.wxu[:, 0], qf.wxu[:, 1], qf.wxu[:, 2], qf.qb,
            data.quad_surface.astype(jnp.float32), z, z, z]
    tbl = jnp.stack(rows, axis=0)
    return jnp.pad(tbl, ((0, 0), (0, qpad - n_rows)))


def pack_joined_table(data, meta, table):
    """Re-pad the primtable join for in-kernel one-hot gathering.

    Input: [Ns_rows + Nq_rows, K] from primtable.build_prim_table.
    Output: [Cpad + Qpad, 32] with sphere rows at [0, Cpad) and quad rows at
    [Cpad, Cpad+Qpad) — matching the kernel's chunk offsets; the in-kernel
    global index is idx + (kind == QUAD) * Cpad.
    """
    ns = data.sph_center.shape[0]
    nq = data.quad_Q.shape[0]
    cpad = _round_up(max(ns, CK), CK)
    qpad = _round_up(max(nq, CK), CK)
    kcols = table.shape[1]
    sph_part = jnp.pad(table[:ns], ((0, cpad - ns), (0, 32 - kcols)))
    quad_part = jnp.pad(table[ns:], ((0, qpad - nq), (0, 32 - kcols)))
    return jnp.concatenate([sph_part, quad_part], axis=0)


def _sphere_chunk_best(rays, sph, t_min, moving):
    """Closest sphere candidate within one (TR, CK) tile."""
    ro = rays[:, 0:3]
    rd = rays[:, 3:6]
    a = jnp.sum(rd * rd, -1, keepdims=True)
    ro_rd = jnp.sum(ro * rd, -1, keepdims=True)
    ro_sq = jnp.sum(ro * ro, -1, keepdims=True)

    cxyz = sph[0:3, :]                              # (3, CK)
    rdc = jax.lax.dot_general(rd, cxyz, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    roc = jax.lax.dot_general(ro, cxyz, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if moving:
        tme = rays[:, 6:7]
        cv = sph[4:7, :]
        rdv = jax.lax.dot_general(rd, cv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rov = jax.lax.dot_general(ro, cv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        half_b = ro_rd - rdc - tme * rdv
        c_term = (ro_sq - 2.0 * roc - 2.0 * tme * rov
                  + sph[3:4, :] + 2.0 * tme * sph[7:8, :]
                  + tme * tme * sph[8:9, :])
    else:
        half_b = ro_rd - rdc
        c_term = ro_sq - 2.0 * roc + sph[3:4, :]

    disc = half_b * half_b - a * c_term
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root1 = (-half_b - sq) * inv_a
    root2 = (-half_b + sq) * inv_a
    root = jnp.where(root1 > t_min, root1, root2)
    valid = (disc >= 0.0) & (root > t_min) & (sph[9:10, :] > 0.0)
    cand = jnp.where(valid, root, BIG)
    ct = jnp.min(cand, axis=1)
    ii = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    ci = jnp.min(jnp.where(cand == ct[:, None], ii, jnp.int32(1 << 30)), axis=1)
    return ct, ci


def _quad_chunk_best(rays, qd, t_min):
    ro = rays[:, 0:3]
    rd = rays[:, 3:6]
    nrm = qd[0:3, :]
    vxw = qd[4:7, :]
    wxu = qd[8:11, :]
    dn = (((1,), (0,)), ((), ()))
    denom = jax.lax.dot_general(rd, nrm, dn, preferred_element_type=jnp.float32)
    ron = jax.lax.dot_general(ro, nrm, dn, preferred_element_type=jnp.float32)
    ok = jnp.abs(denom) >= 1e-8
    t = jnp.where(ok, (qd[3:4, :] - ron) / jnp.where(ok, denom, 1.0), -1.0)
    a1 = jax.lax.dot_general(ro, vxw, dn, preferred_element_type=jnp.float32)
    a2 = jax.lax.dot_general(rd, vxw, dn, preferred_element_type=jnp.float32)
    alpha = a1 + t * a2 - qd[7:8, :]
    b1 = jax.lax.dot_general(ro, wxu, dn, preferred_element_type=jnp.float32)
    b2 = jax.lax.dot_general(rd, wxu, dn, preferred_element_type=jnp.float32)
    beta = b1 + t * b2 - qd[11:12, :]
    valid = (ok & (t > t_min)
             & (alpha >= 0.0) & (alpha <= 1.0)
             & (beta >= 0.0) & (beta <= 1.0)
             & (qd[12:13, :] > 0.0))
    cand = jnp.where(valid, t, BIG)
    ct = jnp.min(cand, axis=1)
    ii = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    ci = jnp.min(jnp.where(cand == ct[:, None], ii, jnp.int32(1 << 30)), axis=1)
    return ct, ci


def _make_kernel(n_sph_chunks, n_quad_chunks, moving, t_min):
    n_all_chunks = n_sph_chunks + n_quad_chunks

    def kernel(rays_ref, sph_ref, quad_ref, tbl_ref,
               t_ref, kind_ref, idx_ref, row_ref):
        rays = rays_ref[:]                      # (TR, 8)
        best_t = jnp.full((TR,), BIG, jnp.float32)
        best_i = jnp.zeros((TR,), jnp.int32)

        def sph_body(k, carry):
            bt, bi = carry
            sph = sph_ref[:, pl.ds(k * CK, CK)]
            ct, ci = _sphere_chunk_best(rays, sph, t_min, moving)
            better = ct < bt
            return (jnp.where(better, ct, bt),
                    jnp.where(better, ci + k * CK, bi))

        best_t, best_i = jax.lax.fori_loop(0, n_sph_chunks, sph_body,
                                           (best_t, best_i))

        qt = jnp.full((TR,), BIG, jnp.float32)
        qi = jnp.zeros((TR,), jnp.int32)

        def quad_body(k, carry):
            bt, bi = carry
            qd = quad_ref[:, pl.ds(k * CK, CK)]
            ct, ci = _quad_chunk_best(rays, qd, t_min)
            better = ct < bt
            return (jnp.where(better, ct, bt),
                    jnp.where(better, ci + k * CK, bi))

        qt, qi = jax.lax.fori_loop(0, n_quad_chunks, quad_body, (qt, qi))

        q_better = qt < best_t        # sphere wins ties (world.cuh order)
        t = jnp.where(q_better, qt, best_t)
        idx = jnp.where(q_better, qi, best_i)
        hit = t < BIG
        kind = jnp.where(hit,
                         jnp.where(q_better, K_QUAD, K_SPHERE),
                         K_NONE).astype(jnp.int32)

        # joined-row "gather" as a one-hot matmul, fully in VMEM: TPU has no
        # fast vector gather, but (TR, CK) one-hot @ (CK, 32) rides the MXU.
        gidx = jnp.where(q_better, idx + n_sph_chunks * CK, idx)

        def row_body(k, acc):
            tbl = tbl_ref[pl.ds(k * CK, CK), :]          # (CK, 32)
            local = gidx - k * CK
            oh = ((local[:, None] ==
                   jax.lax.broadcasted_iota(jnp.int32, (TR, CK), 1))
                  ).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                oh, tbl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        row = jax.lax.fori_loop(0, n_all_chunks, row_body,
                                jnp.zeros((TR, 32), jnp.float32))

        t_ref[0, :, :] = t.reshape(8, 128)
        kind_ref[0, :, :] = kind.reshape(8, 128)
        idx_ref[0, :, :] = idx.reshape(8, 128)
        row_ref[:, :] = row
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_sph_chunks", "n_quad_chunks",
                                    "moving", "t_min", "interpret"))
def _closest_hit(rays, sph_tbl, quad_tbl, joined_tbl, *, n_sph_chunks,
                 n_quad_chunks, moving, t_min, interpret=False):
    R = rays.shape[0]
    grid = R // TR
    out_shape = [
        jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((R, 32), jnp.float32),
    ]
    kernel = _make_kernel(n_sph_chunks, n_quad_chunks, moving, t_min)
    t, kind, idx, row = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TR, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sph_tbl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(quad_tbl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(joined_tbl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(rays, sph_tbl, quad_tbl, joined_tbl)
    return t.reshape(R), kind.reshape(R), idx.reshape(R), row


def closest_hit_pallas(data, meta, qf, table, ro, rd, time, t_min=1e-3,
                       interpret=False):
    """Closest sphere/quad hit + joined shading row via the fused kernel.

    ``table`` is primtable.build_prim_table's join.  Returns
    (best_t [R] with +inf misses, best_kind [R], best_idx [R], row [R,32]).
    Rays are padded to a TR multiple internally.
    """
    R = ro.shape[0]
    rpad = _round_up(R, TR)
    rays = jnp.concatenate(
        [ro, rd, time[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, rpad - R), (0, 0)))
    sph_tbl = pack_spheres(data, meta)
    quad_tbl = pack_quads(data, meta, qf)
    joined = pack_joined_table(data, meta, table)
    t, kind, idx, row = _closest_hit(
        rays, sph_tbl, quad_tbl, joined,
        n_sph_chunks=sph_tbl.shape[1] // CK,
        n_quad_chunks=quad_tbl.shape[1] // CK,
        moving=bool(meta.any_moving), t_min=float(t_min),
        interpret=interpret)
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t[:R], kind[:R], idx[:R], row[:R]
