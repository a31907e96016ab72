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

Every per-(prim, ray) quantity that is *linear* in the per-primitive
constants is folded into the MXU: the kernel builds one per-tile ray-basis
matrix B [K_LIN, TR] (rows: rd, t*rd, ro, t*ro, 1, t, t^2, |ro|^2, ro.rd)
and the packed tables are coefficient rows A so that a single
A @ B dot_general yields the sphere quadratic's half_b and c_term (moving
spheres included — zero center-velocity coefficient rows make the static
case exact) and all six quad plane/basis terms.  K <= 128 rides the MXU's
systolic depth for free, so this costs the same MXU passes as the naive
K=3 products while deleting almost all per-pair VPU arithmetic.  The
skip/padding-row rejection is likewise folded into the tables (a +1e30
constant term makes the discriminant/alpha test fail), not branched.

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

# Ray-basis matrix columns (the K dimension of the folded A @ B matmuls).
K_LIN = 24        # 17 live rows + zero padding to a sublane multiple
_B_RD = 0         # rows 0-2:   rd
_B_TRD = 3        # rows 3-5:   t * rd
_B_RO = 6         # rows 6-8:   ro
_B_TRO = 9        # rows 9-11:  t * ro
_B_ONE = 12       # row 12:     1
_B_T = 13         # row 13:     t (ray time)
_B_T2 = 14        # row 14:     t^2
_B_ROSQ = 15      # row 15:     |ro|^2
_B_RORD = 16      # row 16:     ro . rd

REJECT = 1.0e30   # folded constant that forces the validity test to fail


def _round_up(x, m):
    return -(-x // m) * m


def _interleave_blocks(blocks, cl=None):
    """Stack per-primitive coefficient blocks CL-interleaved.

    blocks: list of [Npad, K] arrays (same Npad, a CL multiple).  Output
    row ((s * n_blocks + p) * CL + r) = blocks[p][s * CL + r] — so one
    contiguous [n_blocks * CL(..CK), K] slice per sub-cluster (or chunk)
    feeds a SINGLE MXU matmul covering every block, instead of n_blocks
    small ones (the kernel's dominant cost at 3k+ primitives).
    """
    cl = cl or CL
    npad = blocks[0].shape[0]
    k = blocks[0].shape[1]
    arr = jnp.stack(blocks, axis=0)                   # [P, Npad, K]
    arr = arr.reshape(len(blocks), npad // cl, cl, k)
    return jnp.transpose(arr, (1, 0, 2, 3)).reshape(len(blocks) * npad, k)


def sphere_row(j):
    """Interleaved table row of primitive j's half_b coefficients; its
    c_term row is sphere_row(j) + CL."""
    return (j // CL) * (2 * CL) + (j % CL)


def quad_row(j, p):
    """Interleaved table row of quad j's p-th coefficient block."""
    return (j // CL) * (6 * CL) + p * CL + (j % CL)


def pack_spheres(data, meta):
    """[2*Cpad, K_LIN] f32 sphere coefficient table (differentiable).

    half_b and c_term coefficient rows, CL-interleaved per sub-cluster
    (``_interleave_blocks``: prim j's rows sit at ``sphere_row(j)`` and
    +CL), so that  half_b = A_h @ B  and  c_term = A_c @ B  give
    exactly the quadratic of objects.cuh:61-88 with motion blur
    (objects.cuh:90-97) folded in.  Skip rows (world.cuh `skip`, used as
    media boundaries) and padding rows carry a +REJECT constant term that
    drives the discriminant negative for every ray.
    """
    if meta.n_spheres == 0:
        return jnp.zeros((0, K_LIN), jnp.float32)
    n_rows = data.sph_center.shape[0]
    cpad = _round_up(max(n_rows, CK), CK)
    c = data.sph_center
    r = data.sph_radius
    cv = data.sph_cvec
    surf = data.sph_surface.astype(jnp.float32)
    ctc_r2 = jnp.sum(c * c, -1) - r * r + (1.0 - surf) * REJECT
    z = jnp.zeros(n_rows, jnp.float32)
    one = jnp.ones(n_rows, jnp.float32)
    # half_b = ro.rd - c.rd - t*(cv.rd)
    a_h = jnp.stack([-c[:, 0], -c[:, 1], -c[:, 2],
                     -cv[:, 0], -cv[:, 1], -cv[:, 2],
                     z, z, z, z, z, z,
                     z, z, z, z, one] +
                    [z] * (K_LIN - 17), axis=1)
    # c_term = |ro|^2 - 2 c.ro - 2t cv.ro + (c.c - r^2) + 2t (c.cv) + t^2 |cv|^2
    a_c = jnp.stack([z, z, z, z, z, z,
                     -2.0 * c[:, 0], -2.0 * c[:, 1], -2.0 * c[:, 2],
                     -2.0 * cv[:, 0], -2.0 * cv[:, 1], -2.0 * cv[:, 2],
                     ctc_r2, 2.0 * jnp.sum(c * cv, -1),
                     jnp.sum(cv * cv, -1), one, z] +
                    [z] * (K_LIN - 17), axis=1)
    pad_h = jnp.zeros((cpad - n_rows, K_LIN), jnp.float32)
    pad_c = pad_h.at[:, _B_ONE].set(REJECT)
    return _interleave_blocks([jnp.concatenate([a_h, pad_h], axis=0),
                               jnp.concatenate([a_c, pad_c], axis=0)])


def pack_quads(data, meta, qf):
    """[6*Qpad, K_LIN] f32 quad coefficient table.

    Six coefficient blocks, CL-interleaved per sub-cluster (quad j's p-th
    block row at ``quad_row(j, p)``): denom = n.rd; num = D - n.ro;
    a1 = vxw.ro - qa; a2 = vxw.rd; b1 = wxu.ro - qb; b2 = wxu.rd — so
    alpha = a1 + t*a2 and beta = b1 + t*b2 reproduce objects.cuh:190-215.
    Skip/padding rows get a1 -= REJECT, failing the alpha window for every
    ray.
    """
    if meta.n_quads == 0:
        return jnp.zeros((0, K_LIN), jnp.float32)
    n_rows = data.quad_Q.shape[0]
    qpad = _round_up(max(n_rows, CK), CK)
    surf = data.quad_surface.astype(jnp.float32)
    z = jnp.zeros(n_rows, jnp.float32)
    zs = [z] * (K_LIN - 17)

    def row(c03=None, c68=None, const=None):
        cols = [z, z, z] if c03 is None else [c03[:, 0], c03[:, 1], c03[:, 2]]
        cols += [z, z, z]
        cols += [z, z, z] if c68 is None else [c68[:, 0], c68[:, 1], c68[:, 2]]
        cols += [z, z, z]
        cols += [z if const is None else const, z, z, z, z] + zs
        return jnp.stack(cols, axis=1)

    blocks = [
        row(c03=qf.normal),                                   # denom
        row(c68=-qf.normal, const=qf.D),                      # num
        row(c68=qf.vxw, const=-qf.qa - (1.0 - surf) * REJECT),  # a1
        row(c03=qf.vxw),                                      # a2
        row(c68=qf.wxu, const=-qf.qb),                        # b1
        row(c03=qf.wxu),                                      # b2
    ]
    pad = jnp.zeros((qpad - n_rows, K_LIN), jnp.float32)
    pad_a1 = pad.at[:, _B_ONE].set(-REJECT)
    pads = [pad, pad, pad_a1, pad, pad, pad]
    return _interleave_blocks(
        [jnp.concatenate([b, p], axis=0) for b, p in zip(blocks, pads)])


AAQ_K = 8         # columns of the axis-aligned-quad table
_AQ_D = 0         # plane coordinate Q_k
_AQ_QI = 1        # window origin along u's axis
_AQ_IUI = 2       # 1 / u_i
_AQ_QJ = 3        # window origin along v's axis
_AQ_IVJ = 4       # 1 / v_j
_AQ_ROW = 5       # original quad registry row (float32-exact, < 2^24)
_AQ_LIVE = 6      # 1.0 for real rows, 0.0 for padding


def aaq_groups_of(meta):
    """Static (class -> row list) grouping of axis-aligned surface quads
    (SceneMeta.aaq_class; 9 = general path, -2 = covered by a closed box
    and tested via the slab fast path instead)."""
    groups = {}
    for row, c in enumerate(meta.aaq_class):
        if 0 <= c <= 8:
            groups.setdefault(c, []).append(row)
    return groups


def pack_aaq(data, meta):
    """Axis-aligned-quad fast-path tables (forward-only; stop_gradient'ed —
    the custom VJP recomputes winners from the general coefficient rows, so
    gradient semantics are identical to the matmul path).

    Returns (tbl [Apad, AAQ_K] f32, groups) where groups is a static tuple
    of (start, n_rows, k, i, j) descriptors: rows [start, start+n_rows) of
    the table are quads whose unit normal is axis ``k`` with u along axis
    ``i`` and v along axis ``j``; each group is 8-row padded with LIVE=0
    rows.  For such a quad the plane/window test of objects.cuh:190-215
    collapses to  t = (Q_k - ro_k)/rd_k,  alpha = (ro_i + t rd_i - Q_i)/u_i,
    beta = (ro_j + t rd_j - Q_j)/v_j  — pure VPU broadcasts, no matmul.
    """
    groups = aaq_groups_of(meta)
    if not groups:
        return jnp.zeros((0, AAQ_K), jnp.float32), ()
    parts, descs, start = [], [], 0
    for c in sorted(groups):
        rows = np.asarray(groups[c], np.int32)
        i, j = c // 3, c % 3
        k = 3 - i - j
        Q = data.quad_Q[rows]
        ui = data.quad_u[rows, i]
        vj = data.quad_v[rows, j]
        n = rows.shape[0]
        tbl = jnp.stack([Q[:, k], Q[:, i], 1.0 / ui, Q[:, j], 1.0 / vj,
                         rows.astype(np.float32) * jnp.ones(n, jnp.float32),
                         jnp.ones(n, jnp.float32),
                         jnp.zeros(n, jnp.float32)], axis=1)
        npad = _round_up(n, 8)
        tbl = jnp.pad(tbl, ((0, npad - n), (0, 0)))
        parts.append(tbl)
        descs.append((start, npad, k, i, j))
        start += npad
    return jax.lax.stop_gradient(jnp.concatenate(parts, axis=0)), tuple(descs)


AAB_K = 16        # columns of the axis-aligned-box table
# cols 0-2: lo xyz; 3-5: hi xyz; 6-11: face quad rows in
# (lo_x, hi_x, lo_y, hi_y, lo_z, hi_z) order (float32-exact, < 2^24);
# col 12: 1.0 for real rows, 0.0 padding


def pack_aab(data, meta):
    """Closed axis-aligned-box slab table (forward-only; stop_gradient'ed —
    the custom VJP recomputes winners from the general quad coefficient
    rows, so gradient semantics are identical to the per-face path).

    One row per SceneMeta.aab box: [lo, hi] derived in-trace from the face
    quads' plane coordinates, plus the six face rows so the winning slab
    resolves to the exact registry row the per-face merge would have
    produced (the entry — or, for inside origins, exit — slab IS the
    closest face hit of a closed box).  Padded to 8 rows.
    """
    if not meta.aab:
        return jnp.zeros((0, AAB_K), jnp.float32)
    rows = np.asarray(meta.aab, np.int32)          # [n, 6]
    n = rows.shape[0]
    cols = []
    for k in range(3):
        cols.append(data.quad_Q[rows[:, 2 * k], k])        # lo_k
    for k in range(3):
        cols.append(data.quad_Q[rows[:, 2 * k + 1], k])    # hi_k
    for f in range(6):
        cols.append(jnp.asarray(rows[:, f], jnp.float32))
    cols.append(jnp.ones(n, jnp.float32))
    cols += [jnp.zeros(n, jnp.float32)] * (AAB_K - len(cols))
    tbl = jnp.stack(cols, axis=1)
    npad = _round_up(n, 8)
    if npad != n:
        # padding rows carry NaN slab planes: every (lo - ro) * ird product
        # is NaN, IEEE comparisons with NaN are false, so both the validity
        # test and the face-id equality reject the row for every ray — no
        # live-mask column read is needed in _aab_best.  (An inverted-box
        # [+big, -big] encoding does NOT work: the per-axis min/max sorts
        # the slab back into a universe-covering box.)
        pad = jnp.full((npad - n, AAB_K), jnp.nan, jnp.float32)
        pad = pad.at[:, 6:].set(0.0)
        tbl = jnp.concatenate([tbl, pad], axis=0)
    return jax.lax.stop_gradient(tbl)


def pack_quads_general(data, meta, qf):
    """Compacted general-orientation quad table + id column.

    Same CL-interleaved six-block layout as :func:`pack_quads`, but holding
    only the *surface* quads the aaq fast path cannot take (aaq_class == 9);
    the id column maps each packed prim slot back to its original registry
    row so closest-hit ties keep the reference's registry order.  Returns
    (tbl [6*Gpad, K_LIN], ids [Gpad] f32 with +inf padding).
    """
    # class 9 = general orientation OR non-surface; non-surface rows are
    # rejected by the surf term exactly as in pack_quads
    rows = [r for r, c in enumerate(meta.aaq_class) if c == 9]
    if not rows:
        return (jnp.zeros((0, K_LIN), jnp.float32),
                jnp.zeros((0,), jnp.float32))
    rows = np.asarray(rows, np.int32)
    n = rows.shape[0]
    gpad = _round_up(max(n, CL), CL)
    surf = data.quad_surface[rows].astype(jnp.float32)
    z = jnp.zeros(n, jnp.float32)
    zs = [z] * (K_LIN - 17)

    def row_blk(c03=None, c68=None, const=None):
        cols = [z, z, z] if c03 is None else [c03[:, 0], c03[:, 1], c03[:, 2]]
        cols += [z, z, z]
        cols += [z, z, z] if c68 is None else [c68[:, 0], c68[:, 1], c68[:, 2]]
        cols += [z, z, z]
        cols += [z if const is None else const, z, z, z, z] + zs
        return jnp.stack(cols, axis=1)

    nrm, vxw, wxu = qf.normal[rows], qf.vxw[rows], qf.wxu[rows]
    D, qa, qb = qf.D[rows], qf.qa[rows], qf.qb[rows]
    blocks = [
        row_blk(c03=nrm),
        row_blk(c68=-nrm, const=D),
        row_blk(c68=vxw, const=-qa - (1.0 - surf) * REJECT),
        row_blk(c03=vxw),
        row_blk(c68=wxu, const=-qb),
        row_blk(c03=wxu),
    ]
    pad = jnp.zeros((gpad - n, K_LIN), jnp.float32)
    pad_a1 = pad.at[:, _B_ONE].set(-REJECT)
    pads = [pad, pad, pad_a1, pad, pad, pad]
    tbl = _interleave_blocks(
        [jnp.concatenate([b, p], axis=0) for b, p in zip(blocks, pads)])
    ids = jnp.concatenate([
        jnp.asarray(rows, jnp.float32),
        jnp.full((gpad - n,), jnp.float32(2.0e9))])
    return tbl, ids


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


def cluster_tree(cbox):
    """Implicit-heap AABB tree over the Morton-ordered CL-sized sub-clusters.

    Because primitive rows are Morton-ordered at compile time
    (scene/build.py), consecutive sub-clusters are spatially coherent, so a
    binary heap over the *sequence* is a valid LBVH: node k covers leaves
    [k<<d, (k+1)<<d) at depth d.  Returns [2L, 6] f32 (lo xyz, hi xyz) with
    node 1 the root, children (2k, 2k+1), leaves at [L, L + n_sub); row 0
    and padding leaves carry inverted boxes (never reachable).  Like the
    flat cull boxes, traversal decisions are detached (stop_gradient).
    """
    import jax
    n_sub = cbox.shape[0]
    L = 1
    while L < n_sub:
        L *= 2
    lo = jnp.pad(cbox[:, 0:3], ((0, L - n_sub), (0, 0)), constant_values=BIG)
    hi = jnp.pad(cbox[:, 3:6], ((0, L - n_sub), (0, 0)), constant_values=-BIG)
    levels = [(lo, hi)]
    while levels[0][0].shape[0] > 1:
        l, h = levels[0]
        levels.insert(0, (jnp.minimum(l[0::2], l[1::2]),
                          jnp.maximum(h[0::2], h[1::2])))
    los = jnp.concatenate([jnp.full((1, 3), BIG, jnp.float32)]
                          + [l for l, _ in levels], axis=0)
    his = jnp.concatenate([jnp.full((1, 3), -BIG, jnp.float32)]
                          + [h for _, h in levels], axis=0)
    return jax.lax.stop_gradient(jnp.concatenate([los, his], axis=1))


_STACK = 32       # traversal stack depth; tree depth is log2(L) + 1 <= 31

# Auto accel policy crossover (single source of truth; tools import this).
# "none" (brute-force MXU scan + aaq/aab fast paths) measured fastest
# through final_scene's 3.4k prims; beyond this linear cost must lose to
# packet-heap pruning.
BVH_MIN_PRIMS = 8192


def auto_accel(n_prims: int) -> str:
    """The accel mode the kernel picks when none is forced."""
    return "none" if n_prims <= BVH_MIN_PRIMS else "bvh"

_DN = (((1,), (0,)), ((), ()))

# f32 dot precision for the geometry/gather matmuls.  TPU's DEFAULT dot
# precision is a single bf16 pass: coefficient products like ro.c at
# |ro||c| ~ 1e6 (scene 1's r=1000 ground sphere) then carry ~4e3 absolute
# error, which fakes self-intersections every bounce and was measured to
# darken sky scenes ~28% (paths die at the depth limit) -- the CPU oracle
# proved the TPU image wrong.  The one-hot row gather is equally affected
# (a bf16 pass truncates every gathered shading attribute to 8 mantissa
# bits).  Mosaic's HIGHEST fixes the coefficient dots but costs ~6 bf16
# MXU passes -- measured at a 20% whole-frame cost on scene 1 (BENCH
# r02 -> r03, PERF.md).
#
# The TPU-native fix exploits the fold's OWN slack instead: the live
# contraction depth is only K_LIVE = 17 and the MXU's systolic depth is
# 128, so the K dimension has room for SIX limb-product pairs.  Writing
# a = a1+a2+a3 and b = b1+b2+b3 (exact 3x-bf16 limb decompositions of
# f32), the six dominant pair products
#     a1b1 + a1b2 + a2b1 + a1b3 + a2b2 + a3b1
# (HIGHEST's own bf16_6x expansion; dropped pairs are < 2^-32 relative)
# are laid out side by side along K -- table columns [a1|a1|a2|a1|a2|a3],
# ray-basis rows [b1|b2|b1|b3|b2|b1], 6*17 = 102 <= 128 -- so ONE native
# bf16 matmul pass computes the full ~2^-24-accurate dot at the exact MXU
# cost of the old wrong single DEFAULT pass.  The one-hot row gather
# contracts over table ROWS (no K slack), so it keeps the explicit 3-pass
# decomposition (_gather3): the 0/1 one-hot side is exactly bf16 and 3
# table limbs cover all 24 mantissa bits.

K_LIVE = 17       # live ray-basis rows (columns 0..16 of the tables)
_PAIR_A = (0, 0, 1, 0, 1, 2)   # table-side limb index per product pair
_PAIR_B = (0, 1, 0, 2, 1, 0)   # ray-side limb index per product pair
# 6*K_LIVE = 102 packed contraction rows <= 128: still one MXU K-tile


def _limbs3(x):
    """Exact 3-limb bf16 decomposition of f32 (all 24 mantissa bits)."""
    l1 = x.astype(jnp.bfloat16)
    r1 = x - l1.astype(jnp.float32)
    l2 = r1.astype(jnp.bfloat16)
    l3 = (r1 - l2.astype(jnp.float32)).astype(jnp.bfloat16)
    return l1, l2, l3


def _limb_pack_rows(coef):
    """IN-KERNEL limb packing of a coefficient-table slice: [rows, K_LIN]
    f32 -> [rows, 6*K_LIVE] bf16, columns laid out per _PAIR_A to match
    ``_ray_basis_packed``'s rows.

    Done inside the Mosaic kernel on purpose: the kernel's operands stay
    the plain f32 coefficient tables (the exact operand pattern every
    loop-nesting structure has been validated against since r03), and all
    bf16 limb arithmetic lives in one place the MXU test pins bit-exactly.
    An earlier variant that packed the tables OUTSIDE the kernel produced
    wrong images whenever the pallas call sat under nested XLA loops
    (fori-of-while) while passing every flat-call test — a
    miscompile-shaped failure this formulation sidesteps entirely.  VPU
    cost: ~5 elementwise ops over the slice per grid step — noise next to
    the chunk matmul."""
    limbs = _limbs3(coef[:, :K_LIVE])
    return jnp.concatenate([limbs[i] for i in _PAIR_A], axis=1)


def _dotp(a, b, dn=None):
    """Limb-packed coefficient dot: one native bf16 MXU pass, f32
    accumulate, ~2^-24-relative products (HIGHEST-equivalent)."""
    dn = _DN if dn is None else dn
    return jax.lax.dot_general(a, b, dn,
                               preferred_element_type=jnp.float32)


def _coef_dot(coef, B):
    """Coefficient-table x ray-basis product, dispatched on the basis form.

    bf16 basis (real Mosaic kernel): in-kernel limb pack + single-pass
    packed dot.  f32 basis (interpret mode): a plain HIGHEST dot — the
    limb-split pattern ``x - f32(bf16(x))`` is algebraically zero, and
    XLA's simplifier (CPU and TPU alike) sometimes eliminates it when the
    interpret-inlined kernel lands inside a large fused graph, silently
    degrading the dot to one bf16 pass.  Interpret mode therefore
    validates the kernel's LOGIC (traversal, ties, fast paths) at f32,
    while the real kernel's limb numerics are pinned on hardware by the
    Mosaic bit-exactness check and the per-round chip parity gate
    (tools/tpu_parity.py)."""
    if B.dtype == jnp.bfloat16:
        return _dotp(_limb_pack_rows(coef), B)
    return jax.lax.dot_general(coef, B, _DN,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _gather3(tbl, oh, dn):
    """EXACT one-hot row gather.  bf16 one-hot (real Mosaic kernel): the
    0/1 one-hot is exactly bf16 and the f32 table splits into 3 bf16 limbs
    covering all 24 mantissa bits, so three bf16 passes reconstruct the
    gathered f32 values bit-exactly.  f32 one-hot (interpret mode): one
    HIGHEST pass — same simplifier hazard as _coef_dot."""
    if oh.dtype != jnp.bfloat16:
        return jax.lax.dot_general(tbl, oh, dn,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
    h1 = tbl.astype(jnp.bfloat16)
    r1 = tbl - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(x, oh, dn,
                                   preferred_element_type=jnp.float32)

    return d(h1) + (d(h2) + d(h3))


def _ray_basis(rays):
    """Build the (K_LIN, TR) ray-basis matrix B from the (8, TR) ray stack.

    Per-tile cost is ~10 elementwise ops on (1, TR) rows — negligible; every
    per-(prim, ray) linear term thereafter is a single A @ B matmul.
    """
    rox, roy, roz = rays[0:1], rays[1:2], rays[2:3]
    rdx, rdy, rdz = rays[3:4], rays[4:5], rays[5:6]
    tme = rays[6:7]
    one = jnp.ones_like(tme)
    ro_sq = rox * rox + roy * roy + roz * roz
    ro_rd = rox * rdx + roy * rdy + roz * rdz
    rows = [rdx, rdy, rdz, tme * rdx, tme * rdy, tme * rdz,
            rox, roy, roz, tme * rox, tme * roy, tme * roz,
            one, tme, tme * tme, ro_sq, ro_rd]
    rows += [jnp.zeros_like(tme)] * (K_LIN - len(rows))
    return jnp.concatenate(rows, axis=0)


def _ray_basis_packed(rays):
    """Limb-packed ray-basis matrix [6*K_LIVE, TR] bf16: the K_LIVE live
    rows of B, 3-limb decomposed and stacked per product pair (_PAIR_B),
    matching ``_limb_pack_rows``'s column layout on the table side."""
    B = _ray_basis(rays)[:K_LIVE]
    limbs = _limbs3(B)
    return jnp.concatenate([limbs[j] for j in _PAIR_B], axis=0)


def _argmin_rows(cand):
    """(min, argmin) over the prim axis of a (CK', TR) candidate tile;
    earlier row wins ties (world.cuh registry order)."""
    ct = jnp.min(cand, axis=0, keepdims=True)
    ii = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ci = jnp.min(jnp.where(cand == ct, ii, jnp.int32(1 << 30)), axis=0,
                 keepdims=True)
    return ct, ci


def _sphere_chunk_best(sph_ref, start, n_sub, B, a, t_min_a):
    """Closest sphere candidate over ``n_sub`` CL-interleaved sub-clusters
    starting at table row ``start``.

    ONE MXU matmul produces both half_b and c_term for every primitive in
    the slice (the interleaved layout keeps the coefficient blocks
    contiguous); candidate index is local to the slice's primitives.
    Roots stay scaled by a = |rd|^2 (> 0, per-ray): the closest-root search
    is monotone under the scaling, so the per-pair division is hoisted out
    of the tile — the winner is unscaled once per ray by the caller."""
    coef = sph_ref[pl.ds(start, n_sub * 2 * CL), :]
    prod = _coef_dot(coef, B)
    r = prod.reshape(n_sub, 2, CL, prod.shape[-1])
    half_b = r[:, 0].reshape(n_sub * CL, -1)
    c_term = r[:, 1].reshape(n_sub * CL, -1)
    disc = half_b * half_b - a * c_term
    # miss lanes (disc < 0) get sq = BIG: root1s = -hb - BIG fails the
    # t_min test and root1s + 2*BIG = +inf >= BIG reads as a miss, so the
    # separate disc >= 0 validity conjunction is redundant (3 fewer VPU
    # passes over the (prims, TR) tile than the max/and formulation)
    sq = jnp.where(disc >= 0.0, jnp.sqrt(disc), BIG)
    root1s = -half_b - sq
    root_s = jnp.where(root1s > t_min_a, root1s, root1s + 2.0 * sq)
    return _argmin_rows(jnp.where(root_s > t_min_a, root_s, BIG))


def _quad_chunk_best(quad_ref, start, n_sub, B, t_min):
    """Closest quad candidate over ``n_sub`` CL-interleaved sub-clusters
    starting at table row ``start``; ONE MXU matmul yields all six
    per-pair terms for the slice."""
    coef = quad_ref[pl.ds(start, n_sub * 6 * CL), :]
    prod = _coef_dot(coef, B)
    r = prod.reshape(n_sub, 6, CL, prod.shape[-1])
    den = r[:, 0].reshape(n_sub * CL, -1)
    num = r[:, 1].reshape(n_sub * CL, -1)
    a1 = r[:, 2].reshape(n_sub * CL, -1)
    a2 = r[:, 3].reshape(n_sub * CL, -1)
    b1 = r[:, 4].reshape(n_sub * CL, -1)
    b2 = r[:, 5].reshape(n_sub * CL, -1)
    ok = jnp.abs(den) >= 1e-8
    t = jnp.where(ok, num / jnp.where(ok, den, 1.0), -1.0)
    alpha = a1 + t * a2
    beta = b1 + t * b2
    valid = (ok & (t > t_min)
             & (alpha >= 0.0) & (alpha <= 1.0)
             & (beta >= 0.0) & (beta <= 1.0))
    return _argmin_rows(jnp.where(valid, t, BIG))


def _min_with_ids(cand, ids):
    """(min t, id-of-min) over the prim axis of a (rows, TR) candidate tile;
    the smallest *id* wins ties — with ids = original registry rows this is
    exactly the reference's earlier-registry-entry-wins rule."""
    ct = jnp.min(cand, axis=0, keepdims=True)
    ci = jnp.min(jnp.where(cand == ct, ids, jnp.float32(2.0e9)), axis=0,
                 keepdims=True)
    return ct, ci


def _quad_gen_best(gen_ref, ids_ref, n_sub, B, t_min):
    """Closest general-orientation quad over the compacted table; candidate
    ids are original registry rows (float32)."""
    coef = gen_ref[pl.ds(0, n_sub * 6 * CL), :]
    prod = _coef_dot(coef, B)
    r = prod.reshape(n_sub, 6, CL, prod.shape[-1])
    den = r[:, 0].reshape(n_sub * CL, -1)
    num = r[:, 1].reshape(n_sub * CL, -1)
    a1 = r[:, 2].reshape(n_sub * CL, -1)
    a2 = r[:, 3].reshape(n_sub * CL, -1)
    b1 = r[:, 4].reshape(n_sub * CL, -1)
    b2 = r[:, 5].reshape(n_sub * CL, -1)
    ok = jnp.abs(den) >= 1e-8
    t = jnp.where(ok, num / jnp.where(ok, den, 1.0), -1.0)
    alpha = a1 + t * a2
    beta = b1 + t * b2
    valid = (ok & (t > t_min)
             & (alpha >= 0.0) & (alpha <= 1.0)
             & (beta >= 0.0) & (beta <= 1.0))
    ids = ids_ref[pl.ds(0, n_sub * CL), :]      # (rows, 1) -> broadcast
    return _min_with_ids(jnp.where(valid, t, BIG), ids)


def _aaq_group_best(aaq_ref, desc, ro_c, rd_c, ird_c, mask_c, t_min):
    """Closest axis-aligned quad within one orientation group.

    ``desc`` = (start, n_rows, k, i, j); ro_c/rd_c/ird_c are per-axis (1,TR)
    ray component rows, mask_c the |rd_k| >= 1e-8 guards.  ~20 VPU broadcast
    ops per (quad, ray) pair — no MXU work at all.
    """
    start, n, k, i, j = desc
    tbl = aaq_ref[pl.ds(start, n), :]
    d = tbl[:, _AQ_D:_AQ_D + 1]
    qi = tbl[:, _AQ_QI:_AQ_QI + 1]
    iu = tbl[:, _AQ_IUI:_AQ_IUI + 1]
    qj = tbl[:, _AQ_QJ:_AQ_QJ + 1]
    iv = tbl[:, _AQ_IVJ:_AQ_IVJ + 1]
    ids = tbl[:, _AQ_ROW:_AQ_ROW + 1]
    live = tbl[:, _AQ_LIVE:_AQ_LIVE + 1] > 0.0
    t = (d - ro_c[k]) * ird_c[k]                      # (n, TR)
    alpha = (ro_c[i] - qi + t * rd_c[i]) * iu
    beta = (ro_c[j] - qj + t * rd_c[j]) * iv
    valid = (live & mask_c[k] & (t > t_min)
             & (alpha >= 0.0) & (alpha <= 1.0)
             & (beta >= 0.0) & (beta <= 1.0))
    ids = jnp.where(live, ids, jnp.float32(2.0e9))
    return _min_with_ids(jnp.where(valid, t, BIG), ids)


# Slab substitute for 1/rd on near-parallel axes (|rd_k| < 1e-8, the
# per-face denominator-guard zone): a huge finite magnitude so that the
# EXACT per-pair difference (lo - ro_k) keeps its sign and the slab
# interval degenerates to "non-constraining when the origin is inside the
# slab, box-missing when outside" — the same outcomes as an explicit
# containment test, without its ~7 VPU ops per (box, axis, ray).  Finite
# (not inf) so (lo - ro) == 0 never produces NaN.  |t| values reach
# |lo - ro| * 1e18 <= ~1e23, far inside f32 range.
_PARALLEL_IRD = 1.0e18


def _aab_best(aab_ref, n_box, ro_c, rd_c, t_min):
    """Closest face of the closed axis-aligned boxes, as one slab test.

    For a closed box the per-face quad merge reduces to: the entry slab
    (t_enter > t_min) or, for origins inside the box, the exit slab — the
    same arithmetic per axis as the aaq face test, so candidates agree
    with the per-face path.  Axes with |rd_k| < 1e-8 mirror the per-face
    denominator guard through the _PARALLEL_IRD substitution: their faces
    cannot win a finite-t pick and their slab constrains by the sign of
    the exact (lo - ro_k) differences — equivalent to origin containment
    except on the measure-zero configuration {|rd_k| < 1e-8 AND ro_k
    exactly on a face plane}, where the old explicit containment test was
    inclusive and this one can reject the box.  ~46 VPU broadcast ops per
    (box, ray) versus ~110 for six independent window tests.
    """
    tbl = aab_ref[pl.ds(0, n_box), :]
    ird_m = []
    for c in rd_c:                             # per-ray rows, ~5 ops each
        m = jnp.abs(c) >= 1e-8
        ird_m.append(jnp.where(m, 1.0 / jnp.where(m, c, 1.0),
                               jnp.where(c >= 0, _PARALLEL_IRD,
                                         -_PARALLEL_IRD)))
    mns, mxs, flo, fhi = [], [], [], []
    for k in range(3):
        lo = tbl[:, k:k + 1]
        hi = tbl[:, 3 + k:4 + k]
        t0 = (lo - ro_c[k]) * ird_m[k]
        t1 = (hi - ro_c[k]) * ird_m[k]
        mns.append(jnp.minimum(t0, t1))
        mxs.append(jnp.maximum(t0, t1))
        flo.append(tbl[:, 6 + 2 * k:7 + 2 * k])
        fhi.append(tbl[:, 7 + 2 * k:8 + 2 * k])
    t_en = jnp.maximum(jnp.maximum(mns[0], mns[1]), mns[2])
    t_ex = jnp.minimum(jnp.minimum(mxs[0], mxs[1]), mxs[2])
    use_en = t_en > t_min
    t_hit = jnp.where(use_en, t_en, t_ex)
    # no live column: padding rows are inverted boxes (pack_aab) whose
    # t_en <= t_ex test never passes
    valid = (t_en <= t_ex) & (t_hit > t_min)

    # face identity in ONE pass over the axes (entry and exit picks share
    # it via slab_hit): the axis achieving t_hit; rays moving +k enter
    # through the lo_k face and exit through hi_k (and vice versa).  Exact
    # edge/corner ties resolve to the LOWEST face registry row, matching
    # the per-face path's (t, id) merge tie-break.
    fid = jnp.full_like(t_hit, 2.0e9)
    for k in range(3):
        pos = rd_c[k] > 0                      # (1, TR), hoisted per tile
        slab_hit = jnp.where(use_en, mns[k], mxs[k])
        fk = jnp.where(pos == use_en, flo[k], fhi[k])
        fid = jnp.minimum(fid, jnp.where(slab_hit == t_hit, fk,
                                         jnp.float32(2.0e9)))
    ids = jnp.where(valid, fid, jnp.float32(2.0e9))
    return _min_with_ids(jnp.where(valid, t_hit, BIG), ids)


def _make_kernel(n_sph_chunks, n_quad_chunks, t_min, accel, tree_L=0,
                 n_gen_sub=0, aaq_groups=(), n_aab=0, n_join_chunks=None,
                 interpret=False):
    """Kernel over (rays, [sph], [quad], tbl, [cbox|tree]) — the sphere/quad
    tables are passed only when their chunk count is nonzero (scene 1 has no
    quads; the Cornell walls scene has no surface spheres), so empty kinds
    cost zero kernel work and zero VMEM.

    ``accel`` selects the acceleration mode:

    * ``"none"``: brute-force scan of every CK chunk.
    * ``"cull"``: linear scan per CL-sized sub-cluster behind a scalar
      any-lane AABB slab pre-test (cbox in SMEM) — a whole 128-prim block is
      skipped when no ray in the tile can reach its box closer than its
      current best hit.
    * ``"bvh"``: packet traversal of the implicit cluster heap
      (``cluster_tree``, SMEM) with a per-tile scalar stack — the TPU
      counterpart of the reference's per-ray stack machine
      (objects.cuh:664-723).  Children are visited front-to-back along the
      tile's mean ray, so early hits narrow per-lane best-t and prune whole
      subtrees; lexicographic (t, row) merging keeps the reference's
      closest-hit tie rules exactly (sphere rows order before quad rows).

    The one-hot row gather is likewise skipped for CK chunks that hold no
    winner in the cull/bvh modes.
    """
    # chunks of the JOINED shading table (always spans every sphere+quad
    # column, independent of which coefficient path found the winner)
    n_all_chunks = (n_join_chunks if n_join_chunks is not None
                    else n_sph_chunks + n_quad_chunks)
    n_sph_sub = n_sph_chunks * (CK // CL)
    n_quad_sub = n_quad_chunks * (CK // CL)
    cull = accel == "cull"
    oh_dtype = jnp.float32 if interpret else jnp.bfloat16

    def kernel(*refs):
        it = iter(refs)
        rays_ref = next(it)
        sph_ref = next(it) if n_sph_chunks else None
        quad_ref = next(it) if n_quad_chunks else None
        gen_ref = next(it) if n_gen_sub else None
        gen_ids_ref = next(it) if n_gen_sub else None
        aaq_ref = next(it) if aaq_groups else None
        aab_ref = next(it) if n_aab else None
        tbl_ref = next(it)
        cbox_ref = next(it) if cull else None
        tree_ref = next(it) if accel == "bvh" else None
        row_ref = next(it)
        stack_ref = next(it, None)              # SMEM scratch (bvh only)

        rays = rays_ref[:]                      # (8, TR)
        rox, roy, roz = rays[0:1], rays[1:2], rays[2:3]
        rdx, rdy, rdz = rays[3:4], rays[4:5], rays[5:6]
        a = rdx * rdx + rdy * rdy + rdz * rdz
        # real kernel: bf16 limb-packed basis; interpret: f32 HIGHEST
        # (_coef_dot docstring)
        B = _ray_basis(rays) if interpret else _ray_basis_packed(rays)
        t_min_a = t_min * a
        sph_rows = n_sph_chunks * CK            # quad block offset in gidx

        if accel == "bvh":
            tiny = 1e-30
            irdx = 1.0 / jnp.where(jnp.abs(rdx) < tiny,
                                   jnp.where(rdx >= 0, tiny, -tiny), rdx)
            irdy = 1.0 / jnp.where(jnp.abs(rdy) < tiny,
                                   jnp.where(rdy >= 0, tiny, -tiny), rdy)
            irdz = 1.0 / jnp.where(jnp.abs(rdz) < tiny,
                                   jnp.where(rdz >= 0, tiny, -tiny), rdz)
            inv_a = 1.0 / a
            # tile mean ray, for front-to-back child ordering (scalars)
            mox, moy, moz = jnp.mean(rox), jnp.mean(roy), jnp.mean(roz)
            mdx, mdy, mdz = jnp.mean(rdx), jnp.mean(rdy), jnp.mean(rdz)

            def node_reachable(k, bt):
                """Any lane's ray enters node k's box in (t_min, best_t).
                All-padding subtrees carry inverted boxes whose +-BIG slab
                products blow up to (-inf, inf), so validity is checked on
                the box itself, not the slab interval."""
                valid = tree_ref[k, 0] <= tree_ref[k, 3]
                x0 = (tree_ref[k, 0] - rox) * irdx
                x1 = (tree_ref[k, 3] - rox) * irdx
                y0 = (tree_ref[k, 1] - roy) * irdy
                y1 = (tree_ref[k, 4] - roy) * irdy
                z0 = (tree_ref[k, 2] - roz) * irdz
                z1 = (tree_ref[k, 5] - roz) * irdz
                lo = jnp.maximum(jnp.maximum(jnp.minimum(x0, x1),
                                             jnp.minimum(y0, y1)),
                                 jnp.minimum(z0, z1))
                hi = jnp.minimum(jnp.minimum(jnp.maximum(x0, x1),
                                             jnp.maximum(y0, y1)),
                                 jnp.maximum(z0, z1))
                return valid & jnp.any((lo <= hi) & (hi > t_min) & (lo < bt))

            def node_key(k):
                """Mean-ray distance to node k's box center (scalar)."""
                cx = 0.5 * (tree_ref[k, 0] + tree_ref[k, 3])
                cy = 0.5 * (tree_ref[k, 1] + tree_ref[k, 4])
                cz = 0.5 * (tree_ref[k, 2] + tree_ref[k, 5])
                return (cx - mox) * mdx + (cy - moy) * mdy + (cz - moz) * mdz

            def merge(ct, gi, bt, bg):
                # lexicographic (t, global row) min == the reference's
                # registry-ordered strict < (sphere rows precede quad rows)
                better = (ct < bt) | ((ct == bt) & (ct < BIG) & (gi < bg))
                return (jnp.where(better, ct, bt), jnp.where(better, gi, bg))

            def sph_leaf(s, bt, bg):
                ct, ci = _sphere_chunk_best(sph_ref, s * 2 * CL, 1, B, a,
                                            t_min_a)
                ct = jnp.where(ct >= BIG, BIG, ct * inv_a)
                return merge(ct, ci + s * CL, bt, bg)

            def quad_leaf(s, bt, bg):
                ct, ci = _quad_chunk_best(quad_ref, s * 6 * CL, 1, B, t_min)
                return merge(ct, ci + s * CL + sph_rows, bt, bg)

            def leaf_fn(s, bt, bg):
                if n_sph_sub and n_quad_sub:
                    return jax.lax.cond(
                        s < n_sph_sub,
                        lambda b, g: sph_leaf(s, b, g),
                        lambda b, g: quad_leaf(s - n_sph_sub, b, g),
                        bt, bg)
                if n_sph_sub:
                    return sph_leaf(s, bt, bg)
                return quad_leaf(s, bt, bg)

            L = tree_L

            def t_cond(c):
                return c[0] > 0

            def t_body(c):
                sp, bt, bg = c
                sp = sp - 1
                node = stack_ref[sp]

                def visit(sp, bt, bg):
                    def leaf(sp, bt, bg):
                        bt, bg = leaf_fn(node - L, bt, bg)
                        return sp, bt, bg

                    def internal(sp, bt, bg):
                        c0 = 2 * node
                        c1 = c0 + 1
                        near_first = node_key(c0) <= node_key(c1)
                        near = jnp.where(near_first, c0, c1)
                        far = jnp.where(near_first, c1, c0)
                        stack_ref[sp] = far
                        stack_ref[sp + 1] = near   # popped first
                        return sp + 2, bt, bg

                    return jax.lax.cond(node >= L, leaf, internal, sp, bt, bg)

                return jax.lax.cond(node_reachable(node, bt), visit,
                                    lambda s, b, g: (s, b, g), sp, bt, bg)

            stack_ref[0] = jnp.int32(1)            # root
            _, t, best_g = jax.lax.while_loop(
                t_cond, t_body,
                (jnp.int32(1),
                 jnp.full((1, TR), BIG, jnp.float32),
                 jnp.full((1, TR), jnp.int32(1 << 30))))

            hit = t < BIG
            if n_sph_sub and n_quad_sub:
                q_win = best_g >= sph_rows
            else:
                q_win = jnp.full_like(hit, bool(n_quad_sub))
            idx = jnp.where(q_win, best_g - sph_rows, best_g)
            idx = jnp.where(hit, idx, 0)
            kind = jnp.where(hit,
                             jnp.where(q_win, K_QUAD, K_SPHERE),
                             K_NONE).astype(jnp.int32)
            gidx = jnp.where(hit, best_g, 0)
            _emit_row(tbl_ref, row_ref, n_all_chunks, hit, gidx, t, kind,
                      idx, guard=n_all_chunks > 1, oh_dtype=oh_dtype)
            return

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
                    ct, ci = _sphere_chunk_best(sph_ref, s * 2 * CL, 1, B, a,
                                                t_min_a)
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
            # unrolled per-chunk dots + pairwise merge: each CK-chunk dot is
            # independent, so the MXU pipelines across chunks instead of
            # serializing on a loop-carried closest-t merge
            if n_sph_chunks:
                cand = [_sphere_chunk_best(sph_ref, k * 2 * CK, CK // CL,
                                           B, a, t_min_a)
                        for k in range(n_sph_chunks)]
                cand = [(ct, ci + k * CK) for k, (ct, ci) in enumerate(cand)]
                while len(cand) > 1:
                    nxt = []
                    for j in range(0, len(cand) - 1, 2):
                        (t0, i0), (t1, i1) = cand[j], cand[j + 1]
                        b = t1 < t0
                        nxt.append((jnp.where(b, t1, t0),
                                    jnp.where(b, i1, i0)))
                    if len(cand) % 2:
                        nxt.append(cand[-1])
                    cand = nxt
                best_t, best_i = cand[0]

        best_t = jnp.where(best_t >= BIG, BIG, best_t * inv_a)

        qt = jnp.full((1, TR), BIG, jnp.float32)
        qi = jnp.zeros((1, TR), jnp.int32)

        if cull:
            def quad_body(s, carry):
                def do(carry):
                    bt, bi = carry
                    ct, ci = _quad_chunk_best(quad_ref, s * 6 * CL, 1, B,
                                              t_min)
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
        elif aaq_groups or n_gen_sub or n_aab:
            # axis-aligned fast path: one slab test per closed box, VPU
            # broadcast tests per quad orientation group, and a compacted
            # matmul table for general-orientation quads; candidate ids are
            # original registry rows, and the lexicographic (t, id) merge
            # reproduces the reference's registry-ordered strict-< closest
            # hit exactly.
            ro_c = (rox, roy, roz)
            rd_c = (rdx, rdy, rdz)
            tiny8 = 1e-8
            mask_c = tuple(jnp.abs(c) >= tiny8 for c in rd_c)
            ird_c = tuple(1.0 / jnp.where(m, c, 1.0)
                          for m, c in zip(mask_c, rd_c))
            cand = []
            if n_gen_sub:
                cand.append(_quad_gen_best(gen_ref, gen_ids_ref, n_gen_sub,
                                           B, t_min))
            if n_aab:
                cand.append(_aab_best(aab_ref, n_aab, ro_c, rd_c, t_min))
            for desc in aaq_groups:
                cand.append(_aaq_group_best(aaq_ref, desc, ro_c, rd_c,
                                            ird_c, mask_c, t_min))
            while len(cand) > 1:
                nxt = []
                for j in range(0, len(cand) - 1, 2):
                    (t0, i0), (t1, i1) = cand[j], cand[j + 1]
                    b = (t1 < t0) | ((t1 == t0) & (t1 < BIG) & (i1 < i0))
                    nxt.append((jnp.where(b, t1, t0),
                                jnp.where(b, i1, i0)))
                if len(cand) % 2:
                    nxt.append(cand[-1])
                cand = nxt
            qt, qi_f = cand[0]
            qi = qi_f.astype(jnp.int32)
        else:
            if n_quad_chunks:
                cand = [_quad_chunk_best(quad_ref, k * 6 * CK, CK // CL,
                                         B, t_min)
                        for k in range(n_quad_chunks)]
                cand = [(ct, ci + k * CK) for k, (ct, ci) in enumerate(cand)]
                while len(cand) > 1:
                    nxt = []
                    for j in range(0, len(cand) - 1, 2):
                        (t0, i0), (t1, i1) = cand[j], cand[j + 1]
                        b = t1 < t0
                        nxt.append((jnp.where(b, t1, t0),
                                    jnp.where(b, i1, i0)))
                    if len(cand) % 2:
                        nxt.append(cand[-1])
                    cand = nxt
                qt, qi = cand[0]

        q_better = qt < best_t        # sphere wins ties (world.cuh order)
        t = jnp.where(q_better, qt, best_t)
        idx = jnp.where(q_better, qi, best_i)
        hit = t < BIG
        kind = jnp.where(hit,
                         jnp.where(q_better, K_QUAD, K_SPHERE),
                         K_NONE).astype(jnp.int32)
        gidx = jnp.where(q_better, idx + n_sph_chunks * CK, idx)
        _emit_row(tbl_ref, row_ref, n_all_chunks, hit, gidx, t, kind, idx,
                  guard=cull and n_all_chunks > 1, oh_dtype=oh_dtype)
    return kernel


def _emit_row(tbl_ref, row_ref, n_all_chunks, hit, gidx, t, kind, idx, *,
              guard, oh_dtype=jnp.bfloat16):
    """Gather the winners' joined rows and write the kernel output.

    The joined-row "gather" is a one-hot matmul, fully in VMEM: TPU has no
    fast vector gather, but (32, CK) tbl @ (CK, TR) one-hot rides the MXU
    and lands the row transposed — [32, TR] — so the shading pass's
    per-column reads are contiguous.  With ``guard``, CK chunks holding no
    winner are skipped.  Rows >= ROW_T of the join are zero padding; the
    closest-hit scalars ride there so the kernel has one Mosaic-legal
    (32, TR) output block.
    """
    def row_chunk(k, acc):
        tbl = tbl_ref[:, pl.ds(k * CK, CK)]          # (32, CK)
        local = gidx - k * CK
        oh = (local == jax.lax.broadcasted_iota(
            jnp.int32, (CK, TR), 0)).astype(oh_dtype)
        return acc + _gather3(tbl, oh, (((1,), (0,)), ((), ())))

    if guard:
        def row_body(k, acc):
            lo = k * CK
            present = jnp.any(hit & (gidx >= lo) & (gidx < lo + CK))
            return jax.lax.cond(present, lambda a: row_chunk(k, a),
                                lambda a: a, acc)

        row = jax.lax.fori_loop(0, n_all_chunks, row_body,
                                jnp.zeros((ROW_K, TR), jnp.float32))
    else:
        # unrolled: the per-chunk one-hot dots are independent adds, so the
        # MXU pipelines them (a fori_loop would serialize on the accumulator)
        row = jnp.zeros((ROW_K, TR), jnp.float32)
        for k in range(n_all_chunks):
            row = row_chunk(k, row)
    row_ref[:, :] = jnp.concatenate(
        [row[:ROW_T], t, kind.astype(jnp.float32),
         idx.astype(jnp.float32),
         jnp.zeros((ROW_K - ROW_IDX - 1, TR), jnp.float32)], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("n_sph_chunks", "n_quad_chunks",
                                    "t_min", "accel", "interpret",
                                    "aaq_groups"))
def _closest_hit(rays, sph_tbl, quad_tbl, joined_tbl, cbox, gen_tbl, gen_ids,
                 aaq_tbl, aab_tbl, *, n_sph_chunks, n_quad_chunks, t_min,
                 accel, interpret=False, aaq_groups=()):
    R = rays.shape[1]
    grid = R // TR
    out_shape = [
        jax.ShapeDtypeStruct((ROW_K, R), jnp.float32),
    ]
    tree_L = cbox.shape[0] // 2 if accel == "bvh" else 0
    n_aab = aab_tbl.shape[0]
    fastq = bool(aaq_groups) or n_aab > 0
    n_gen_sub = gen_tbl.shape[0] // (6 * CL) if fastq else 0
    n_join = joined_tbl.shape[1] // CK
    # in fast-quad mode the full quad coefficient table is not a kernel
    # operand
    n_qc = 0 if fastq else n_quad_chunks
    kernel = _make_kernel(n_sph_chunks, n_qc, t_min, accel, tree_L,
                          n_gen_sub=n_gen_sub, aaq_groups=aaq_groups,
                          n_aab=n_aab, n_join_chunks=n_join,
                          interpret=interpret)
    operands = [rays]
    in_specs = [pl.BlockSpec((8, TR), lambda i: (0, i), memory_space=pltpu.VMEM)]
    if n_sph_chunks:
        operands.append(sph_tbl)
        in_specs.append(pl.BlockSpec(sph_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if n_qc:
        operands.append(quad_tbl)
        in_specs.append(pl.BlockSpec(quad_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if n_gen_sub:
        operands.append(gen_tbl)
        in_specs.append(pl.BlockSpec(gen_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gen_ids.reshape(-1, 1))
        in_specs.append(pl.BlockSpec((gen_ids.shape[0], 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if aaq_groups:
        operands.append(aaq_tbl)
        in_specs.append(pl.BlockSpec(aaq_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if n_aab:
        operands.append(aab_tbl)
        in_specs.append(pl.BlockSpec(aab_tbl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    operands.append(joined_tbl)
    in_specs.append(pl.BlockSpec(joined_tbl.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    if accel in ("cull", "bvh"):
        # cull: flat [n_sub, 8] cluster boxes; bvh: [2L, 6] implicit heap
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
        scratch_shapes=([pltpu.SMEM((_STACK,), jnp.int32)]
                        if accel == "bvh" else []),
        # the unrolled per-chunk dots keep several (6*CK, TR) coefficient
        # products alive so the MXU can pipeline them; that needs more than
        # the 16 MiB default scoped-vmem allowance (v5e has 128 MiB VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
    return (row[ROW_T], row[ROW_KIND].astype(jnp.int32),
            row[ROW_IDX].astype(jnp.int32), row)


# ---------------------------------------------------------------------------
# Custom VJP: differentiate through the kernel
# ---------------------------------------------------------------------------
# The closest-hit argmin is a detached discrete choice (SURVEY.md section 7,
# "hard parts": visibility/branch choices are frozen under perturbation).
# Conditioned on the winner (kind, idx), both outputs are cheap analytic
# functions of the inputs:
#   * t: the winner's root, recomputed per ray from its 2 (sphere) or 6
#     (quad) coefficient rows — O(R*K_LIN) gathers instead of the O(R*C)
#     bandwidth-bound XLA intersector the backward used to fall back to;
#   * row: a column gather of the joined table — its VJP is a scatter-add.
# Gradients therefore flow to every differentiable scene leaf through
# pack_spheres/pack_quads/pack_joined_table and to the ray state (origin,
# direction, time), while the cull boxes stay stop_gradient'ed like BVH
# traversal decisions.


def _t_winner(rays, hrow, crow, qrow, kind, t_min, has_s, has_q):
    """Recompute the winning hit distance analytically (objects.cuh:61-88 /
    190-215), numerically guarded so vjp cotangents of non-winning lanes
    are exactly zero (no NaN * 0)."""
    B = _ray_basis(rays)                       # [K_LIN, R]
    rdx, rdy, rdz = rays[3], rays[4], rays[5]
    a = rdx * rdx + rdy * rdy + rdz * rdz
    # a == 0 only for the all-zero PAD lanes of the chunked backward
    # (rays are padded to the chunk multiple); root/a would be NaN there
    # and a NaN reaches the accumulator even through a zero one-hot row
    # (NaN * 0 = NaN on the MXU) — so divide by a guarded a instead
    a = jnp.where(a > 0.0, a, 1.0)
    t = jnp.zeros_like(a)
    if has_s:
        is_s = kind == K_SPHERE
        half_b = jnp.sum(hrow * B.T, axis=1)
        c_term = jnp.sum(crow * B.T, axis=1)
        disc = half_b * half_b - a * c_term
        disc = jnp.where(is_s, disc, 1.0)
        sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
        root1 = -half_b - sq
        root = jnp.where(root1 > t_min * a, root1, root1 + 2.0 * sq)
        t = t + jnp.where(is_s, root / a, 0.0)
    if has_q:
        is_q = kind == K_QUAD
        den = jnp.sum(qrow[:, 0] * B.T, axis=1)
        num = jnp.sum(qrow[:, 1] * B.T, axis=1)
        den = jnp.where(is_q & (jnp.abs(den) >= 1e-8), den, 1.0)
        t = t + jnp.where(is_q, num / den, 0.0)
    return t


@functools.lru_cache(maxsize=None)
def _closest_hit_vjp(n_sph_chunks, n_quad_chunks, t_min, accel, interpret,
                     aaq_groups=()):
    kw = dict(n_sph_chunks=n_sph_chunks, n_quad_chunks=n_quad_chunks,
              t_min=t_min, accel=accel, interpret=interpret,
              aaq_groups=aaq_groups)

    def run(rays, sph_tbl, quad_tbl, joined_tbl, cbox, gen_tbl, gen_ids,
            aaq_tbl, aab_tbl):
        return _closest_hit(rays, sph_tbl, quad_tbl, joined_tbl, cbox,
                            gen_tbl, gen_ids, aaq_tbl, aab_tbl, **kw)

    f = jax.custom_vjp(run)

    def fwd(rays, sph_tbl, quad_tbl, joined_tbl, cbox, gen_tbl, gen_ids,
            aaq_tbl, aab_tbl):
        out = run(rays, sph_tbl, quad_tbl, joined_tbl, cbox, gen_tbl,
                  gen_ids, aaq_tbl, aab_tbl)
        t, kind, idx, _row = out
        return out, (rays, sph_tbl, quad_tbl, t, kind, idx)

    def bwd(res, cts):
        # The whole backward runs as ONE lax.scan over VMEM-sized ray
        # chunks.  Two prior formulations were measured and rejected:
        #
        # * nine XLA scatter-adds of [R]-sized updates per bounce (the
        #   obvious d_table accumulation) — the single largest backward
        #   cost: TPU scatter serializes at ~6 cycles/update regardless
        #   of how many updates are drops (~45 ms/scatter at 600x338);
        # * a Pallas MXU one-hot scatter kernel (r04) — grad-exact but 2x
        #   slower end-to-end: the custom call perturbed XLA's schedule
        #   around it.
        #
        # Here each chunk builds ONE bf16 one-hot over the joined column
        # space (sphere prim i -> column i, quad prim j -> cpad + j, miss
        # -> dropped), uses it twice on the MXU: forward to GATHER the
        # winner coefficient rows (3 bf16 limb passes reconstruct f32
        # bit-exactly, _gather3's argument), and transposed to
        # SEGMENT-SUM every cotangent column at once (3-limb on the value
        # side, so sums are f32-accurate).  The winner-t vjp is
        # elementwise per ray and runs inside the chunk; all [R, 24]-
        # sized intermediates stay chunk-local, which also removes the
        # two ~10 ms winner-row gather fusions and the full-size pad/
        # concat traffic the unchunked version paid.
        rays, sph_tbl, quad_tbl, t, kind, idx = res
        dt, _dk, _di, drow = cts
        hit = kind != K_NONE
        # the spare output rows alias (t, kind, idx); fold their cotangent in
        dt_eff = jnp.where(hit, dt + drow[ROW_T], 0.0)

        cpad = sph_tbl.shape[0] // 2
        qpad = quad_tbl.shape[0] // 6
        has_s, has_q = n_sph_chunks > 0, n_quad_chunks > 0
        n_cols = (n_sph_chunks + n_quad_chunks) * CK
        gidx = jnp.where(kind == K_QUAD, idx + n_sph_chunks * CK, idx)
        gidx = jnp.where(hit, gidx, n_cols)

        # de-interleave the coefficient tables into per-block [prims, K]
        # matrices once, outside the scan (sphere_row/quad_row layout),
        # and lay ALL their bf16 limbs side by side in one gather operand:
        # a single [prims, blocks*3*K] MXU pass replaces blocks*3 narrow
        # dots whose 24-wide outputs each padded to a full 128-lane slot
        def limb_concat(blocks):
            cols = []
            for b in blocks:
                cols.extend(_limbs3(b))
            return jnp.concatenate(cols, axis=1)

        def limb_sum(o, j):
            base = 3 * K_LIN * j
            return (o[:, base:base + K_LIN]
                    + (o[:, base + K_LIN:base + 2 * K_LIN]
                       + o[:, base + 2 * K_LIN:base + 3 * K_LIN]))

        if has_s:
            s_blk = sph_tbl.reshape(-1, 2, CL, K_LIN)
            sph_g = limb_concat([s_blk[:, 0].reshape(cpad, K_LIN),
                                 s_blk[:, 1].reshape(cpad, K_LIN)])
        if has_q:
            q_blk = quad_tbl.reshape(-1, 6, CL, K_LIN)
            quad_g = limb_concat([q_blk[:, p].reshape(qpad, K_LIN)
                                  for p in range(6)])

        R = rays.shape[1]
        V = (2 * K_LIN if has_s else 0) + (6 * K_LIN if has_q else 0) + ROW_T
        ch = 2048 if n_cols > 2048 else 8192
        rpad = _round_up(R, ch)
        if rpad != R:
            z = jnp.zeros(rpad - R, jnp.float32)
            gidx = jnp.concatenate(
                [gidx, jnp.full(rpad - R, n_cols, jnp.int32)])
            dt_eff = jnp.concatenate([dt_eff, z])
            kind_p = jnp.concatenate(
                [kind, jnp.zeros(rpad - R, kind.dtype)])
            rays_p = jnp.concatenate(
                [rays, jnp.zeros((rays.shape[0], rpad - R), rays.dtype)],
                axis=1)
            drow_p = jnp.concatenate(
                [drow[:ROW_T], jnp.zeros((ROW_T, rpad - R), drow.dtype)],
                axis=1)
        else:
            kind_p, rays_p, drow_p = kind, rays, drow[:ROW_T]
        it = rpad // ch
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, n_cols), 1)
        dn_f = (((1,), (0,)), ((), ()))    # oh [ch, n] @ tbl-limb [n, K]
        dn_b = (((0,), (0,)), ((), ()))    # oh [ch, n] ^T @ vals [ch, V]

        xs = (gidx.reshape(it, ch),
              dt_eff.reshape(it, ch),
              kind_p.reshape(it, ch),
              rays_p.reshape(rays.shape[0], it, ch).transpose(1, 0, 2),
              drow_p.reshape(ROW_T, it, ch).transpose(1, 0, 2))

        def chunk_body(acc, inp):
            g, dte, kd, rays_c, drow_c = inp
            oh = (g[:, None] == col_iota).astype(jnp.bfloat16)
            if has_s:
                o_s = jax.lax.dot_general(
                    oh[:, :cpad], sph_g, dn_f,
                    preferred_element_type=jnp.float32)
                hrow = limb_sum(o_s, 0)
                crow = limb_sum(o_s, 1)
            else:
                hrow = crow = jnp.zeros((ch, K_LIN), jnp.float32)
            if has_q:
                o_q = jax.lax.dot_general(
                    oh[:, cpad:], quad_g, dn_f,
                    preferred_element_type=jnp.float32)
                qrow = jnp.stack([limb_sum(o_q, p) for p in range(6)],
                                 axis=1)                 # [ch, 6, K]
            else:
                qrow = jnp.zeros((ch, 6, K_LIN), jnp.float32)

            _, vjp_fn = jax.vjp(
                lambda r, h, c, q: _t_winner(r, h, c, q, kd, t_min,
                                             has_s, has_q),
                rays_c, hrow, crow, qrow)
            d_rays_c, d_h, d_c, d_q = vjp_fn(dte)

            parts = []
            if has_s:
                parts += [d_h, d_c]
            if has_q:
                parts.append(d_q.reshape(ch, 6 * K_LIN))
            parts.append(drow_c.T)
            vals = jnp.concatenate(parts, axis=1)        # [ch, V]
            l1, l2, l3 = _limbs3(vals)
            d = lambda x: jax.lax.dot_general(
                oh, x, dn_b, preferred_element_type=jnp.float32)
            return acc + (d(l1) + (d(l2) + d(l3))), d_rays_c

        out, d_rays_st = jax.lax.scan(
            chunk_body, jnp.zeros((n_cols, V), jnp.float32), xs)
        d_rays = d_rays_st.transpose(1, 0, 2).reshape(rays.shape[0],
                                                      rpad)[:, :R]

        o = 0
        if has_s:
            d_sph = _interleave_blocks(
                [out[:cpad, :K_LIN], out[:cpad, K_LIN:2 * K_LIN]])
            o = 2 * K_LIN
        else:
            d_sph = jnp.zeros_like(sph_tbl)
        if has_q:
            dq = out[cpad:cpad + qpad, o:o + 6 * K_LIN]
            d_quad = _interleave_blocks(
                [dq[:, p * K_LIN:(p + 1) * K_LIN] for p in range(6)])
            o += 6 * K_LIN
        else:
            d_quad = jnp.zeros_like(quad_tbl)
        # columns >= ROW_T of the joined-row output alias the scalars
        # handled via dt_eff; their cotangent rows stay zero
        d_joined = jnp.concatenate(
            [out[:, o:o + ROW_T].T,
             jnp.zeros((ROW_K - ROW_T, n_cols), jnp.float32)], axis=0)

        # gen/aaq/aab fast-path tables are forward-only re-expressions of
        # the quad rows (stop_gradient'ed); all quad gradients flow through
        # d_quad above, exactly as in the matmul-only formulation
        return d_rays, d_sph, d_quad, d_joined, None, None, None, None, None

    f.defvjp(fwd, bwd)
    return f


def pack_for_kernel(data, meta, qf, table, t_min=1e-3, interpret=False,
                    cull=None, accel=None):
    """Build every per-scene kernel operand ONCE: the f32 coefficient
    tables (the differentiable leaves the custom VJP scatters into), the
    joined shading table, accel structures, and the cached custom-vjp
    callable.

    Callers that invoke the kernel inside a bounce loop (wavefront spans,
    the lockstep integrator) should call this BEFORE the loop and pass the
    result as ``closest_hit_pallas(..., prepacked=...)``: it keeps the
    per-scene packing ops out of the loop body (XLA's loop passes were
    measured to blow span compile up ~20x on them), and under reverse-mode
    AD the pack VJP runs once instead of per bounce.
    """
    sph_tbl = pack_spheres(data, meta)
    quad_tbl = pack_quads(data, meta, qf)
    joined = pack_joined_table(data, meta, table)
    n_prims = (meta.n_spheres + meta.n_quads)
    if accel is None:
        if cull is not None:
            accel = "cull" if cull else "none"
        else:
            accel = auto_accel(n_prims)
    aaq_groups = ()
    gen_tbl = jnp.zeros((0, K_LIN), jnp.float32)
    gen_ids = jnp.zeros((0,), jnp.float32)
    aaq_tbl = jnp.zeros((0, AAQ_K), jnp.float32)
    aab_tbl = jnp.zeros((0, AAB_K), jnp.float32)
    if accel == "none" and meta.n_quads and (aaq_groups_of(meta) or meta.aab):
        aaq_tbl, aaq_groups = pack_aaq(data, meta)
        gen_tbl, gen_ids = pack_quads_general(data, meta, qf)
        aab_tbl = pack_aab(data, meta)
    if accel == "bvh":
        cbox = cluster_tree(cluster_boxes(data, meta, qf))
    elif accel == "cull":
        cbox = cluster_boxes(data, meta, qf)
    else:
        cbox = None
    fn = _closest_hit_vjp(sph_tbl.shape[0] // (2 * CK),
                          quad_tbl.shape[0] // (6 * CK),
                          float(t_min), str(accel), bool(interpret),
                          aaq_groups)
    # baked call parameters ride along so closest_hit_pallas can reject a
    # conflicting prepacked (the baked values would otherwise silently win)
    baked = {"t_min": float(t_min), "interpret": bool(interpret),
             "accel": str(accel)}
    return fn, (sph_tbl, quad_tbl, joined, cbox, gen_tbl, gen_ids,
                aaq_tbl, aab_tbl), baked


def closest_hit_pallas(data, meta, qf, table, ro, rd, time, t_min=1e-3,
                       interpret=False, cull=None, accel=None,
                       prepacked=None):
    """Closest sphere/quad hit + joined shading row via the fused kernel.

    ``table`` is primtable.build_prim_table's join.  ``ro``/``rd`` are SoA
    V3 (render/vec.py) or [R,3] arrays.  Returns (best_t [R] with +inf
    misses, best_kind [R], best_idx [R], row_t [32, R]).  Rays are padded
    to a TR multiple internally.  ``prepacked`` is pack_for_kernel's
    result, for callers that hoist table packing out of a bounce loop.

    ``accel`` selects the in-kernel acceleration: "none" (brute-force MXU
    scan, with axis-aligned quads — box/wall geometry — routed through a
    matmul-free VPU fast path), "cull" (linear scan with per-sub-cluster
    any-lane AABB guards), or "bvh" (packet traversal of the implicit
    cluster heap).  Auto policy: "none" up to 8192 primitives — measured
    fastest through final_scene's 3.4k prims, where incoherent bounced-ray
    packets defeat any-lane pruning (every cluster is reachable by some
    lane) — and "bvh" beyond, where linear cost must eventually lose to
    pruning.  ``cull`` is the deprecated bool alias (True -> "cull",
    False -> "none").
    """
    from .vec import V3
    if not isinstance(ro, V3):
        ro, rd = V3.from_rows(ro), V3.from_rows(rd)
    R = time.shape[0]
    rpad = _round_up(R, TR)
    zero = jnp.zeros(R, jnp.float32)
    rays = jnp.stack([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, time, zero], axis=0)
    rays = jnp.pad(rays, ((0, 0), (0, rpad - R)))
    if prepacked is None:
        prepacked = pack_for_kernel(data, meta, qf, table, t_min=t_min,
                                    interpret=interpret, cull=cull,
                                    accel=accel)
    else:
        fn_, ops_, baked = prepacked
        # reject conflicting call-site arguments (the baked values win the
        # kernel call, so a silent mismatch would be a correctness trap)
        assert baked["t_min"] == float(t_min), \
            f"prepacked t_min {baked['t_min']} != call t_min {t_min}"
        assert baked["interpret"] == bool(interpret), \
            f"prepacked interpret={baked['interpret']} != call {interpret}"
        if accel is not None:
            assert baked["accel"] == str(accel), \
                f"prepacked accel={baked['accel']!r} != call {accel!r}"
        elif cull is not None:
            want = "cull" if cull else "none"
            assert baked["accel"] == want, \
                f"prepacked accel={baked['accel']!r} != cull={cull}"
    fn, ops = prepacked[0], prepacked[1]
    t, kind, idx, row = fn(rays, *ops)
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t[:R], kind[:R], idx[:R], row[:, :R]
