"""Pallas TPU kernel: fused closest-hit over spheres + quads.

The XLA formulation of the batched intersection (intersect.py) materialises
[R, C] intermediates in HBM (the matmul outputs and the elementwise
quadratic terms) — measured bandwidth-bound at ~15 ms per 512K rays x 488
spheres.  This kernel tiles rays (TR per grid step) and primitives (CK per
inner loop step), keeps every [CK, TR] tile in VMEM, feeds the ray-primitive
inner products to the MXU, and writes only the per-ray closest-hit results.

Everything is *ray-transposed*: rays arrive as [8, R] (a cheap stack of the
SoA V3 components, no relayout), compute tiles are (CK, TR) with rays in
the 128-lane minor dimension, and outputs are [R] vectors plus the joined
shading row as [32, R] — so the consumer's per-column reads are contiguous
[R] slices instead of strided lane gathers (profiled at 3.6 ms/bounce in
the row-major formulation, the single largest cost in the render loop).

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

TR = 1024     # rays per grid step (lane-minor)
CK = 512      # primitives per row-gather chunk (sublane-major)
CL = 128      # primitives per cull sub-cluster (AABB-guarded test block)
NEG_BIG = -1e30
BIG = 3.0e38  # python literal: jnp scalars would be captured consts in the kernel

ROW_K = 32    # rows of the transposed shading-row output
# Spare rows of the [32, R] output carry the closest-hit scalars (a single
# Mosaic-legal (32, TR) output block; idx fits float32 exactly, < 2^24).
ROW_T = 27
ROW_KIND = 28
ROW_IDX = 29


def _round_up(x, m):
    return -(-x // m) * m


def pack_spheres(data, meta):
    """[Cpad, 12] f32 sphere table (differentiable, in-trace)."""
    if meta.n_spheres == 0:
        return jnp.zeros((0, 12), jnp.float32)
    n_rows = data.sph_center.shape[0]
    cpad = _round_up(max(n_rows, CK), CK)
    c = data.sph_center
    r = data.sph_radius
    cv = data.sph_cvec
    ctc_r2 = jnp.sum(c * c, -1) - r * r
    cols = [c[:, 0], c[:, 1], c[:, 2], ctc_r2,
            cv[:, 0], cv[:, 1], cv[:, 2], jnp.sum(c * cv, -1),
            jnp.sum(cv * cv, -1),
            data.sph_surface.astype(jnp.float32),
            jnp.zeros(n_rows), jnp.zeros(n_rows)]
    tbl = jnp.stack(cols, axis=1)
    return jnp.pad(tbl, ((0, cpad - n_rows), (0, 0)))


def pack_quads(data, meta, qf):
    """[Qpad, 16] f32 quad table (empty scenes: zero chunks)."""
    if meta.n_quads == 0:
        return jnp.zeros((0, 16), jnp.float32)
    n_rows = data.quad_Q.shape[0]
    qpad = _round_up(max(n_rows, CK), CK)
    z = jnp.zeros(n_rows)
    cols = [qf.normal[:, 0], qf.normal[:, 1], qf.normal[:, 2], qf.D,
            qf.vxw[:, 0], qf.vxw[:, 1], qf.vxw[:, 2], qf.qa,
            qf.wxu[:, 0], qf.wxu[:, 1], qf.wxu[:, 2], qf.qb,
            data.quad_surface.astype(jnp.float32), z, z, z]
    tbl = jnp.stack(cols, axis=1)
    return jnp.pad(tbl, ((0, qpad - n_rows), (0, 0)))


def pack_joined_table(data, meta, table):
    """Re-pack the primtable join, transposed, for in-kernel one-hot gathers.

    Input: [Ns_rows + Nq_rows, K] from primtable.build_prim_table.
    Output: [32, Cpad + Qpad] with sphere rows at columns [0, Cpad) and quad
    rows at [Cpad, Cpad+Qpad) — matching the kernel's chunk offsets; the
    in-kernel global index is idx + (kind == QUAD) * Cpad.
    """
    ns = data.sph_center.shape[0]
    nq = data.quad_Q.shape[0]
    cpad = _round_up(max(ns, CK), CK) if meta.n_spheres else 0
    qpad = _round_up(max(nq, CK), CK) if meta.n_quads else 0
    kcols = table.shape[1]
    parts = []
    if cpad:
        parts.append(jnp.pad(table[:ns], ((0, cpad - ns), (0, ROW_K - kcols))))
    if qpad:
        parts.append(jnp.pad(table[ns:ns + nq],
                             ((0, qpad - nq), (0, ROW_K - kcols))))
    return jnp.concatenate(parts, axis=0).T


def cluster_boxes(data, meta, qf):
    """[n_sub, 8] f32 conservative AABBs of CL-sized primitive sub-clusters
    (min xyz, max xyz, 0, 0), sphere clusters first then quad clusters —
    matching the kernel's sub-cluster iteration order.  Row order is the
    registry order, which is spatially coherent for the reference scenes
    (e.g. random_spheres appends in grid order, mort.cu:141-171).  Culling
    decisions are non-differentiable (like BVH traversal): boxes are
    stop_gradient'ed.

    Moving spheres use their swept box over t in [0,1] (objects.cuh:50-54);
    non-surface (skip) and padding rows get empty boxes (min > max)."""
    import jax
    parts = []
    if meta.n_spheres:
        n = data.sph_center.shape[0]
        cpad = _round_up(max(n, CK), CK)
        c = data.sph_center
        cv = data.sph_cvec
        r = jnp.abs(data.sph_radius)[:, None]
        lo = jnp.minimum(c, c + cv) - r
        hi = jnp.maximum(c, c + cv) + r
        surf = data.sph_surface[:, None]
        lo = jnp.where(surf, lo, BIG)
        hi = jnp.where(surf, hi, -BIG)
        lo = jnp.pad(lo, ((0, cpad - n), (0, 0)), constant_values=BIG)
        hi = jnp.pad(hi, ((0, cpad - n), (0, 0)), constant_values=-BIG)
        parts.append((lo, hi))
    if meta.n_quads:
        n = data.quad_Q.shape[0]
        qpad = _round_up(max(n, CK), CK)
        Q = data.quad_Q
        corners = jnp.stack([Q, Q + data.quad_u, Q + data.quad_v,
                             Q + data.quad_u + data.quad_v], axis=0)
        lo = jnp.min(corners, axis=0) - 1e-4
        hi = jnp.max(corners, axis=0) + 1e-4
        surf = data.quad_surface[:, None]
        lo = jnp.where(surf, lo, BIG)
        hi = jnp.where(surf, hi, -BIG)
        lo = jnp.pad(lo, ((0, qpad - n), (0, 0)), constant_values=BIG)
        hi = jnp.pad(hi, ((0, qpad - n), (0, 0)), constant_values=-BIG)
        parts.append((lo, hi))
    subs = []
    for lo, hi in parts:
        ns = lo.shape[0] // CL
        subs.append(jnp.concatenate(
            [jnp.min(lo.reshape(ns, CL, 3), axis=1),
             jnp.max(hi.reshape(ns, CL, 3), axis=1),
             jnp.zeros((ns, 2), jnp.float32)], axis=1))
    return jax.lax.stop_gradient(jnp.concatenate(subs, axis=0))


def _sphere_chunk_best(rox, roy, roz, rdx, rdy, rdz, tme, a, ro_rd, ro_sq,
                       sph, t_min, moving):
    """Closest sphere candidate within one (CK, TR) tile.

    Per-ray values are (1, TR); per-prim columns of ``sph`` [CK, 12] are
    (CK, 1); all coupling terms are (CK, 3) @ (3, TR) MXU matmuls."""
    cxyz = sph[:, 0:3]                              # (CK, 3)
    dn = (((1,), (0,)), ((), ()))
    rd3 = jnp.concatenate([rdx, rdy, rdz], axis=0)  # (3, TR)
    ro3 = jnp.concatenate([rox, roy, roz], axis=0)
    rdc = jax.lax.dot_general(cxyz, rd3, dn, preferred_element_type=jnp.float32)
    roc = jax.lax.dot_general(cxyz, ro3, dn, preferred_element_type=jnp.float32)
    if moving:
        cv = sph[:, 4:7]
        rdv = jax.lax.dot_general(cv, rd3, dn, preferred_element_type=jnp.float32)
        rov = jax.lax.dot_general(cv, ro3, dn, preferred_element_type=jnp.float32)
        half_b = ro_rd - rdc - tme * rdv
        c_term = (ro_sq - 2.0 * roc - 2.0 * tme * rov
                  + sph[:, 3:4] + 2.0 * tme * sph[:, 7:8]
                  + tme * tme * sph[:, 8:9])
    else:
        half_b = ro_rd - rdc
        c_term = ro_sq - 2.0 * roc + sph[:, 3:4]

    disc = half_b * half_b - a * c_term
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # roots scaled by a (> 0, per-ray): the closest-root search is monotone
    # under the scaling, so the per-pair division by a is hoisted out of the
    # (CK, TR) tile — the winner is unscaled once per ray by the caller.
    t_min_a = t_min * a
    root1s = -half_b - sq
    root2s = -half_b + sq
    root_s = jnp.where(root1s > t_min_a, root1s, root2s)
    valid = (disc >= 0.0) & (root_s > t_min_a) & (sph[:, 9:10] > 0.0)
    cand = jnp.where(valid, root_s, BIG)
    ct = jnp.min(cand, axis=0, keepdims=True)               # (1, TR) scaled
    ii = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ci = jnp.min(jnp.where(cand == ct, ii, jnp.int32(1 << 30)), axis=0,
                 keepdims=True)
    return ct, ci


def _quad_chunk_best(rox, roy, roz, rdx, rdy, rdz, qd, t_min):
    nrm = qd[:, 0:3]
    vxw = qd[:, 4:7]
    wxu = qd[:, 8:11]
    dn = (((1,), (0,)), ((), ()))
    rd3 = jnp.concatenate([rdx, rdy, rdz], axis=0)
    ro3 = jnp.concatenate([rox, roy, roz], axis=0)
    denom = jax.lax.dot_general(nrm, rd3, dn, preferred_element_type=jnp.float32)
    ron = jax.lax.dot_general(nrm, ro3, dn, preferred_element_type=jnp.float32)
    ok = jnp.abs(denom) >= 1e-8
    t = jnp.where(ok, (qd[:, 3:4] - ron) / jnp.where(ok, denom, 1.0), -1.0)
    a1 = jax.lax.dot_general(vxw, ro3, dn, preferred_element_type=jnp.float32)
    a2 = jax.lax.dot_general(vxw, rd3, dn, preferred_element_type=jnp.float32)
    alpha = a1 + t * a2 - qd[:, 7:8]
    b1 = jax.lax.dot_general(wxu, ro3, dn, preferred_element_type=jnp.float32)
    b2 = jax.lax.dot_general(wxu, rd3, dn, preferred_element_type=jnp.float32)
    beta = b1 + t * b2 - qd[:, 11:12]
    valid = (ok & (t > t_min)
             & (alpha >= 0.0) & (alpha <= 1.0)
             & (beta >= 0.0) & (beta <= 1.0)
             & (qd[:, 12:13] > 0.0))
    cand = jnp.where(valid, t, BIG)
    ct = jnp.min(cand, axis=0, keepdims=True)
    ii = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ci = jnp.min(jnp.where(cand == ct, ii, jnp.int32(1 << 30)), axis=0,
                 keepdims=True)
    return ct, ci


def _make_kernel(n_sph_chunks, n_quad_chunks, moving, t_min, cull):
    """Kernel over (rays, [sph], [quad], tbl, [cbox]) — the sphere/quad
    tables are passed only when their chunk count is nonzero (scene 1 has no
    quads; the Cornell walls scene has no surface spheres), so empty kinds
    cost zero kernel work and zero VMEM.

    ``cull``: primitive tests run per CL-sized sub-cluster behind a scalar
    any-lane AABB slab pre-test (cbox in SMEM) — a whole 128-prim block is
    skipped when no ray in the tile can reach its box closer than its
    current best hit.  The one-hot row gather is likewise skipped for CK
    chunks that hold no winner.
    """
    n_all_chunks = n_sph_chunks + n_quad_chunks
    n_sph_sub = n_sph_chunks * (CK // CL)
    n_quad_sub = n_quad_chunks * (CK // CL)

    def kernel(*refs):
        it = iter(refs)
        rays_ref = next(it)
        sph_ref = next(it) if n_sph_chunks else None
        quad_ref = next(it) if n_quad_chunks else None
        tbl_ref = next(it)
        cbox_ref = next(it) if cull else None
        (row_ref,) = it

        rays = rays_ref[:]                      # (8, TR)
        rox, roy, roz = rays[0:1], rays[1:2], rays[2:3]
        rdx, rdy, rdz = rays[3:4], rays[4:5], rays[5:6]
        tme = rays[6:7]
        a = rdx * rdx + rdy * rdy + rdz * rdz
        ro_rd = rox * rdx + roy * rdy + roz * rdz
        ro_sq = rox * rox + roy * roy + roz * roz

        if cull:
            tiny = 1e-30
            irdx = 1.0 / jnp.where(jnp.abs(rdx) < tiny,
                                   jnp.where(rdx >= 0, tiny, -tiny), rdx)
            irdy = 1.0 / jnp.where(jnp.abs(rdy) < tiny,
                                   jnp.where(rdy >= 0, tiny, -tiny), rdy)
            irdz = 1.0 / jnp.where(jnp.abs(rdz) < tiny,
                                   jnp.where(rdz >= 0, tiny, -tiny), rdz)

        def cluster_reachable(s, bt):
            """Scalar: does any lane's ray enter sub-cluster s's box in
            (t_min, per-lane best_t)?  Slab test (aabb.cuh:37-59)."""
            x0 = (cbox_ref[s, 0] - rox) * irdx
            x1 = (cbox_ref[s, 3] - rox) * irdx
            y0 = (cbox_ref[s, 1] - roy) * irdy
            y1 = (cbox_ref[s, 4] - roy) * irdy
            z0 = (cbox_ref[s, 2] - roz) * irdz
            z1 = (cbox_ref[s, 5] - roz) * irdz
            lo = jnp.maximum(jnp.maximum(jnp.minimum(x0, x1),
                                         jnp.minimum(y0, y1)),
                             jnp.minimum(z0, z1))
            hi = jnp.minimum(jnp.minimum(jnp.maximum(x0, x1),
                                         jnp.maximum(y0, y1)),
                             jnp.maximum(z0, z1))
            return jnp.any((lo <= hi) & (hi > t_min) & (lo < bt))

        # sphere candidates are compared in a-scaled t (see
        # _sphere_chunk_best); unscaled only once after the loop.
        inv_a = 1.0 / a
        best_t = jnp.full((1, TR), BIG, jnp.float32)
        best_i = jnp.zeros((1, TR), jnp.int32)

        if cull:
            def sph_body(s, carry):
                def do(carry):
                    bt, bi = carry
                    sph = sph_ref[pl.ds(s * CL, CL), :]
                    ct, ci = _sphere_chunk_best(rox, roy, roz, rdx, rdy, rdz,
                                                tme, a, ro_rd, ro_sq, sph,
                                                t_min, moving)
                    better = ct < bt
                    return (jnp.where(better, ct, bt),
                            jnp.where(better, ci + s * CL, bi))
                bt_un = jnp.where(carry[0] >= BIG, BIG, carry[0] * inv_a)
                return jax.lax.cond(cluster_reachable(s, bt_un), do,
                                    lambda c: c, carry)

            if n_sph_chunks:
                best_t, best_i = jax.lax.fori_loop(0, n_sph_sub, sph_body,
                                                   (best_t, best_i))
        else:
            def sph_body(k, carry):
                bt, bi = carry
                sph = sph_ref[pl.ds(k * CK, CK), :]
                ct, ci = _sphere_chunk_best(rox, roy, roz, rdx, rdy, rdz, tme,
                                            a, ro_rd, ro_sq, sph, t_min, moving)
                better = ct < bt
                return (jnp.where(better, ct, bt),
                        jnp.where(better, ci + k * CK, bi))

            if n_sph_chunks:
                best_t, best_i = jax.lax.fori_loop(0, n_sph_chunks, sph_body,
                                                   (best_t, best_i))

        best_t = jnp.where(best_t >= BIG, BIG, best_t * inv_a)

        qt = jnp.full((1, TR), BIG, jnp.float32)
        qi = jnp.zeros((1, TR), jnp.int32)

        if cull:
            def quad_body(s, carry):
                def do(carry):
                    bt, bi = carry
                    qd = quad_ref[pl.ds(s * CL, CL), :]
                    ct, ci = _quad_chunk_best(rox, roy, roz, rdx, rdy, rdz,
                                              qd, t_min)
                    better = ct < bt
                    return (jnp.where(better, ct, bt),
                            jnp.where(better, ci + s * CL, bi))
                # quad boxes sit after the sphere boxes; prune against the
                # running quad-best AND the sphere best (closest-hit overall)
                bt_eff = jnp.minimum(carry[0], best_t)
                return jax.lax.cond(
                    cluster_reachable(n_sph_sub + s, bt_eff), do,
                    lambda c: c, carry)

            if n_quad_chunks:
                qt, qi = jax.lax.fori_loop(0, n_quad_sub, quad_body, (qt, qi))
        else:
            def quad_body(k, carry):
                bt, bi = carry
                qd = quad_ref[pl.ds(k * CK, CK), :]
                ct, ci = _quad_chunk_best(rox, roy, roz, rdx, rdy, rdz, qd, t_min)
                better = ct < bt
                return (jnp.where(better, ct, bt),
                        jnp.where(better, ci + k * CK, bi))

            if n_quad_chunks:
                qt, qi = jax.lax.fori_loop(0, n_quad_chunks, quad_body, (qt, qi))

        q_better = qt < best_t        # sphere wins ties (world.cuh order)
        t = jnp.where(q_better, qt, best_t)
        idx = jnp.where(q_better, qi, best_i)
        hit = t < BIG
        kind = jnp.where(hit,
                         jnp.where(q_better, K_QUAD, K_SPHERE),
                         K_NONE).astype(jnp.int32)

        # joined-row "gather" as a one-hot matmul, fully in VMEM: TPU has no
        # fast vector gather, but (32, CK) tbl @ (CK, TR) one-hot rides the
        # MXU and lands the row transposed — [32, TR] — so the shading
        # pass's per-column reads are contiguous.
        gidx = jnp.where(q_better, idx + n_sph_chunks * CK, idx)

        def row_chunk(k, acc):
            tbl = tbl_ref[:, pl.ds(k * CK, CK)]          # (32, CK)
            local = gidx - k * CK
            oh = (local == jax.lax.broadcasted_iota(
                jnp.int32, (CK, TR), 0)).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                tbl, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if cull and n_all_chunks > 1:
            def row_body(k, acc):
                lo = k * CK
                present = jnp.any(hit & (gidx >= lo) & (gidx < lo + CK))
                return jax.lax.cond(present, lambda a: row_chunk(k, a),
                                    lambda a: a, acc)
        else:
            row_body = row_chunk

        row = jax.lax.fori_loop(0, n_all_chunks, row_body,
                                jnp.zeros((ROW_K, TR), jnp.float32))

        # rows >= ROW_T of the join are zero padding; carry the closest-hit
        # scalars there so the kernel has one Mosaic-legal (32, TR) output.
        row_ref[:, :] = jnp.concatenate(
            [row[:ROW_T], t, kind.astype(jnp.float32),
             idx.astype(jnp.float32),
             jnp.zeros((ROW_K - ROW_IDX - 1, TR), jnp.float32)], axis=0)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_sph_chunks", "n_quad_chunks",
                                    "moving", "t_min", "cull", "interpret"))
def _closest_hit(rays, sph_tbl, quad_tbl, joined_tbl, cbox, *, n_sph_chunks,
                 n_quad_chunks, moving, t_min, cull, interpret=False):
    R = rays.shape[1]
    grid = R // TR
    out_shape = [
        jax.ShapeDtypeStruct((ROW_K, R), jnp.float32),
    ]
    kernel = _make_kernel(n_sph_chunks, n_quad_chunks, moving, t_min, cull)
    operands = [rays]
    in_specs = [pl.BlockSpec((8, TR), lambda i: (0, i), memory_space=pltpu.VMEM)]
    if n_sph_chunks:
        operands.append(sph_tbl)
        in_specs.append(pl.BlockSpec(sph_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if n_quad_chunks:
        operands.append(quad_tbl)
        in_specs.append(pl.BlockSpec(quad_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    operands.append(joined_tbl)
    in_specs.append(pl.BlockSpec(joined_tbl.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    if cull:
        operands.append(cbox)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    [row] = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW_K, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return (row[ROW_T], row[ROW_KIND].astype(jnp.int32),
            row[ROW_IDX].astype(jnp.int32), row)


def closest_hit_pallas(data, meta, qf, table, ro, rd, time, t_min=1e-3,
                       interpret=False, cull=None):
    """Closest sphere/quad hit + joined shading row via the fused kernel.

    ``table`` is primtable.build_prim_table's join.  ``ro``/``rd`` are SoA
    V3 (render/vec.py) or [R,3] arrays.  Returns (best_t [R] with +inf
    misses, best_kind [R], best_idx [R], row_t [32, R]).  Rays are padded
    to a TR multiple internally.  ``cull`` (default: auto) enables the
    sub-cluster AABB pre-test.
    """
    from .vec import V3
    if not isinstance(ro, V3):
        ro, rd = V3.from_rows(ro), V3.from_rows(rd)
    R = time.shape[0]
    rpad = _round_up(R, TR)
    zero = jnp.zeros(R, jnp.float32)
    rays = jnp.stack([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, time, zero], axis=0)
    rays = jnp.pad(rays, ((0, 0), (0, rpad - R)))
    sph_tbl = pack_spheres(data, meta)
    quad_tbl = pack_quads(data, meta, qf)
    joined = pack_joined_table(data, meta, table)
    n_prims = (meta.n_spheres + meta.n_quads)
    if cull is None:
        # guard overhead beats the savings below ~1 CK chunk of work
        # (measured: scene 1's 485 spheres render faster unguarded)
        cull = n_prims > CK
    cbox = cluster_boxes(data, meta, qf) if cull else None
    t, kind, idx, row = _closest_hit(
        rays, sph_tbl, quad_tbl, joined, cbox,
        n_sph_chunks=sph_tbl.shape[0] // CK,
        n_quad_chunks=quad_tbl.shape[0] // CK,
        moving=bool(meta.any_moving), t_min=float(t_min),
        cull=bool(cull), interpret=interpret)
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t[:R], kind[:R], idx[:R], row[:, :R]
