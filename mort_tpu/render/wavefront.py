"""Persistent wavefront integrator with in-window ray regeneration.

The reference megakernel gives every pixel-thread its full spp x bounce_limit
loop (camera.cuh:178-192) and eats the divergence on the GPU's SIMT
hardware.  TPUs execute in lockstep, so dead lanes are pure waste: in
scene 1 the mean path length is ~3-4 segments against a 20-bounce limit.

This integrator keeps a fixed pool of P lanes at high occupancy.  A *task*
is a (pixel, sample-chunk) pair — ``spt`` stratified samples of one pixel.
Owning a whole chunk lets a lane accumulate radiance in a register
(``Lsum``) and regenerate its next camera ray the moment a path terminates,
*inside* the bounce loop; the expensive framebuffer scatter-add happens only
once per finished chunk (~spt paths), and refill/deposit rounds (the other
per-window overhead) amortise over long windows without the occupancy
collapse a retire-only-at-window-end design has:

  while tasks remain or lanes active:
      deposit: lanes whose chunk completed scatter-add Lsum into the
               framebuffer (out-of-range index + mode='drop' otherwise)
      refill:  idle lanes claim the next tasks via a cumsum-rank
      window:  several intersect+shade bounce steps; a terminated path
               immediately folds into Lsum and respawns the lane on the
               next sample of its chunk

The counter-based RNG keys draws by (pixel, sample, bounce, slot), so the
wavefront produces exactly the same per-sample radiance values as the
lockstep integrator (integrator.py) and the CPU oracle — only the
accumulation order differs.  Task order is chunk-major (task = c*W*H + p),
so partial progress covers whole images first.

This is also the O(1)-in-depth replacement for the reference's
bounce_limit*W*H recursion scratch (mort.cu:712-725).

Multi-chip
----------
``render_wavefront(..., mesh=...)`` shards the task space over a
``jax.sharding.Mesh`` — 1-D ("rays") or the 2-D ("dcn", "ici")
hosts-by-chips shape (parallel.sharding.make_mesh) — with ``shard_map``:
the mesh axes flatten into one data-parallel axis and pixels are dealt
round-robin to the shards (global pixel = local * n_shards + shard_id — interleaving
balances the per-region cost variation across the image), the scene and
camera are replicated (the analogue of the reference's __constant__
upload), and the framebuffer is row-sharded; the forward pass needs ZERO
collectives, exactly like the reference's pixel grid (mort.cu:98-106) but
across chips.

Sharded (and progressive) renders are **bit-identical for any mesh size**:
device executions are aligned to sample-chunk *layers* (layer c = tasks
covering samples [c*spt, (c+1)*spt) of every pixel), so each pixel receives
exactly one framebuffer add per layer, its accumulation order is
layer-ascending regardless of pool size or in-flight scheduling, and the
per-sample radiance itself is pinned by the counter RNG.  Caveat: scenes
rendered in deferred-texture mode (image/perlin fallbacks, `_defer_tex_ok`)
are deterministic per config but not bit-identical across window/pool/mesh
choices — the round-boundary grouping of the deferred texel multiply is
config-dependent (see ``_span_core``'s defer_tex note; DEVIATIONS §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, derive_basis, get_rays_soa
from ..rng import DEFAULT_SEED
from ..scene.build import SceneData, SceneMeta
from .hitshade import finalize_and_shade
from .intersect import T_MIN, intersect_best, media_pass, quad_frames
from .primtable import build_prim_table
from . import pallas_intersect as pal
from . import vec as v3
from .vec import V3


# NOTE on ray sorting (removed in round 3): a Morton position+direction
# argsort of the lane pool per window round was built and measured twice on
# final_scene (3.4k prims).  Round 2, linear cull scan: the argsort+gather
# cost exceeded the extra cull hits.  Round 3, with *ordered* packet-heap
# traversal (accel="bvh"): per-round cost rose 71 ms -> 87 ms (the in-loop
# argsort + 21 lane-state gathers cost ~16 ms at pool 2^17) while kernel
# time did not drop at all — diffuse bounces decohere the pool within one
# bounce, so only the first post-sort bounce of each window could benefit.
# Coherence-by-sorting does not pay on TPU for diffuse-dominated workloads;
# the kernel treats packets as incoherent by design.


def _span_core(data: SceneData, cam: Camera, seed, fb, task_start,
               task_end, shard_id, *, meta: SceneMeta, pool: int, chunk: int,
               window: int, use_pallas: bool, spt: int, per: int,
               n_shards: int, pallas_interpret: bool = False,
               pallas_accel=None, no_defocus: bool = False,
               defer_tex: bool = False):
    """Run the wavefront over local chunk-tasks [task_start, task_end);
    accumulate into fb (donated).  Splitting a render across calls keeps
    single device executions short (the tunneled TPU kills very long
    launches) and gives checkpointable progress.

    ``spt``: stratified samples per task (lane-local accumulation length).
    ``window``: bounce steps between deposit/refill rounds.
    ``use_pallas``: fused closest-hit + one-hot row kernel (TPU backend).
    ``per``/``n_shards``/``shard_id``: local pixel count and round-robin
    shard placement — local pixel p maps to global pixel p*n_shards+shard_id
    (identity when n_shards == 1).  RNG and camera rays always use the
    global pixel id, so renders are sharding-invariant.

    ``defer_tex``: deferred-resolve fallback textures.  The image-texel
    gather is serialized ~10 ns/lane on TPU and the 7-octave perlin is
    VPU-heavy; evaluated for every lane every bounce they were measured at
    34% of the whole scene-8 round.  In this mode a lane hitting a
    fallback-textured surface samples its scatter direction as usual
    (direction draws never need the albedo), banks the pdf ratio into
    beta, records (tid, u, v, p) in a pending slot and KEEPS BOUNCING —
    contributions its path makes while the texel is owed accumulate in a
    side register ``Lp`` so that the true radiance stays
    ``L + texel * Lp``; once per deposit round ONE texture_value pass
    pays every slot (``L/Lsum += texel * Lp``, ``beta *= texel``).  Only
    a lane that hits a SECOND fallback surface while its slot is busy
    stalls for the rest of the window (measured ~0.3% of lanes vs ~5.5%
    that hit a fallback surface per bounce on final_scene — the
    stall-everyone design cost 11 points of occupancy).  Per-path factor
    products are algebraically unchanged; the f32 association differs
    from the lockstep integrator (mult is not associative) and — unlike
    the stall-everyone design — the texel*(sum of contributions)
    grouping depends on where round boundaries fall, so defer-tex scenes
    are deterministic for a FIXED (window, pool, mesh) config but not
    bit-identical across configs; scenes without fallback textures keep
    full cross-config bit-identity (DEVIATIONS section 7).  Requires no
    emissive material with a fallback texture (render_wavefront checks;
    emission would need the texel immediately)."""
    W, H = cam.image_width, cam.image_height
    WH = W * H
    spp = cam.sqrt_spp * cam.sqrt_spp
    total = task_end
    inv_spp = jnp.float32(1.0 / spp)
    basis = derive_basis(cam)
    qf = quad_frames(data)
    table, mat_cols = build_prim_table(data, meta, qf)
    # All per-scene kernel tables built ONCE per span, outside the bounce
    # loop (pallas_intersect.pack_for_kernel docstring: packing inside the
    # loop body was measured to blow span compile up ~20x).
    prepacked = (pal.pack_for_kernel(data, meta, qf, table,
                                     interpret=pallas_interpret,
                                     accel=pallas_accel)
                 if use_pallas else None)
    P = pool

    def to_global(local_pixel):
        if n_shards == 1:
            return local_pixel
        return local_pixel * n_shards + shard_id

    bg = cam.background

    def bounce_step(carry):
        (alive, pixel, sample, send, ro, rd, tme, bounce, L, Lsum, beta,
         useful) = carry[:12]
        if defer_tex:
            (slot_busy, path_pend, stalled, pu, pv, ptid, pp,
             pu2, pv2, ptid2, pp2, Lp) = carry[12:]
            act = alive & ~stalled
        else:
            act = alive
        gpix = to_global(pixel)
        useful = useful + jnp.sum(act.astype(jnp.uint32))
        if use_pallas:
            bt, bk, bi, row_t = pal.closest_hit_pallas(
                data, meta, qf, table, ro, rd, tme,
                interpret=pallas_interpret, accel=pallas_accel,
                prepacked=prepacked)
            if meta.media:
                bt, bk, bi = media_pass(data, meta, qf, ro, rd, seed,
                                        gpix, sample, bounce, T_MIN,
                                        bt, bk, bi)
        else:
            bt, bk, bi = intersect_best(data, meta, qf, ro.to_rows(),
                                        rd.to_rows(), tme, seed,
                                        gpix, sample, bounce, chunk=chunk)
            row_t = None
        out = finalize_and_shade(data, meta, qf, table, mat_cols, ro, rd,
                                 tme, bt, bk, bi, seed, gpix, sample,
                                 bounce, row_t=row_t, defer_tex=defer_tex)

        miss = act & ~out.hit
        lterm = act & out.hit & ~out.scatter_ok
        cont = act & out.hit & out.scatter_ok

        if defer_tex:
            # contributions made while this path owes a texel factor go to
            # Lp: the round-end resolve adds texel * Lp (module docstring)
            c = (v3.where(miss, beta * V3(bg[0], bg[1], bg[2]), 0.0)
                 + v3.where(lterm | (cont & ~out.skip_pdf),
                            beta * out.emission, 0.0))
            L = L + v3.where(path_pend, 0.0, c)
            Lp = Lp + v3.where(path_pend, c, 0.0)
        else:
            L = L + v3.where(miss, beta * V3(bg[0], bg[1], bg[2]), 0.0)
            L = L + v3.where(lterm, beta * out.emission, 0.0)
            L = L + v3.where(cont & ~out.skip_pdf, beta * out.emission, 0.0)
        beta = v3.where(cont, beta * out.weight, beta)
        ro = v3.where(cont, out.p, ro)
        rd = v3.where(cont, out.new_dir, rd)
        bounce = jnp.where(cont, bounce + 1, bounce)
        path_on = cont & (bounce < cam.bounce_limit)

        if defer_tex:
            # lane owes beta a texel factor: record the lookup in the
            # pending slot and KEEP BOUNCING (contributions now route to
            # Lp above; the round-end resolve pays the factor).  A second
            # fallback hit while the slot is busy parks the lookup in the
            # spare slot and stalls the lane until the resolve shifts it
            # in (rare: two fallback hits inside one window).  A path that
            # just died at the depth limit owes nothing (its tail
            # contributes 0, camera.cuh:161-163).
            new_pend = path_on & out.tex_pending
            first = new_pend & ~slot_busy
            second = new_pend & slot_busy
            pu = jnp.where(first, out.tex_u, pu)
            pv = jnp.where(first, out.tex_v, pv)
            ptid = jnp.where(first, out.tex_tid, ptid)
            pp = v3.where(first, out.p, pp)
            slot_busy = slot_busy | first
            path_pend = path_pend | first
            pu2 = jnp.where(second, out.tex_u, pu2)
            pv2 = jnp.where(second, out.tex_v, pv2)
            ptid2 = jnp.where(second, out.tex_tid, ptid2)
            pp2 = v3.where(second, out.p, pp2)
            stalled = stalled | second

        # fold the finished path into the lane's chunk sum and respawn on
        # the next sample of the chunk, inside the window
        path_done = act & ~path_on
        Lsum = Lsum + v3.where(path_done, L, 0.0)
        more = path_done & (sample + 1 < send)
        sample = jnp.where(more, sample + 1, sample)
        ro_n, rd_n, t_n = get_rays_soa(cam, basis, seed, gpix, sample,
                                       no_defocus=no_defocus)
        ro = v3.where(more, ro_n, ro)
        rd = v3.where(more, rd_n, rd)
        tme = jnp.where(more, t_n, tme)
        bounce = jnp.where(more, 0, bounce)
        L = v3.where(more, 0.0, L)
        beta = v3.where(more, 1.0, beta)
        alive = path_on | more
        if defer_tex:
            # the pending ownership ends with the path; the slot itself
            # (and Lp) survives until the round-end resolve, which routes
            # texel * Lp into Lsum for ~path_pend slots
            path_pend = path_pend & ~path_done
            alive = alive | stalled
            return (alive, pixel, sample, send, ro, rd, tme, bounce, L,
                    Lsum, beta, useful, slot_busy, path_pend, stalled,
                    pu, pv, ptid, pp, pu2, pv2, ptid2, pp2, Lp)
        return (alive, pixel, sample, send, ro, rd, tme, bounce, L, Lsum,
                beta, useful)

    def body(state):
        (counter, fb, alive, pend, pixel, sample, send, ro, rd, tme, bounce,
         L, Lsum, beta, iters, useful) = state[:16]
        if defer_tex:
            (slot_busy, path_pend, stalled, pu, pv, ptid, pp,
             pu2, pv2, ptid2, pp2, Lp) = state[16:]

        # --- deposit chunk sums finished in the previous window ---
        # non-depositing lanes get an out-of-bounds index (NOT -1, which jnp
        # wraps to the last row) and are dropped by the scatter.  Three
        # scalar scatters: TPU scatter of [P] scalars is ~5x faster than of
        # [P,3] rows (measured).
        # distinct out-of-range indices for non-depositing lanes: a single
        # shared drop index makes XLA's scatter serialize the conflict chain
        dep_idx = jnp.where(pend, pixel, per + jnp.arange(P, dtype=jnp.int32))
        fb = (fb[0].at[dep_idx].add(Lsum.x * inv_spp, mode="drop"),
              fb[1].at[dep_idx].add(Lsum.y * inv_spp, mode="drop"),
              fb[2].at[dep_idx].add(Lsum.z * inv_spp, mode="drop"))
        Lsum = v3.where(pend, 0.0, Lsum)

        # --- refill idle lanes with fresh chunk-tasks ---
        idle = ~alive
        ranks = jnp.cumsum(idle.astype(jnp.uint32)) - 1
        task = counter + jnp.where(idle, ranks, 0)
        new_pixel = (task % per).astype(jnp.int32)
        has = idle & (task < total)
        if n_shards > 1:
            # round-robin padding pixels (global id >= W*H) are consumed
            # but never activated
            has = has & (to_global(new_pixel) < WH)
        chunk_id = (task // per).astype(jnp.int32)
        s0 = chunk_id * spt
        pixel = jnp.where(has, new_pixel, pixel)
        sample = jnp.where(has, s0, sample)
        send = jnp.where(has, jnp.minimum(s0 + spt, spp), send)
        ro_n, rd_n, t_n = get_rays_soa(cam, basis, seed, to_global(pixel),
                                       sample, no_defocus=no_defocus)
        ro = v3.where(has, ro_n, ro)
        rd = v3.where(has, rd_n, rd)
        tme = jnp.where(has, t_n, tme)
        bounce = jnp.where(has, 0, bounce)
        L = v3.where(has, 0.0, L)
        Lsum = v3.where(has, 0.0, Lsum)
        beta = v3.where(has, 1.0, beta)
        alive = alive | has
        counter = counter + jnp.sum(idle.astype(jnp.uint32))

        entering = alive

        # --- a window of bounce steps ---
        carry = (alive, pixel, sample, send, ro, rd, tme, bounce, L, Lsum,
                 beta, useful)
        if defer_tex:
            carry = carry + (slot_busy, path_pend, stalled, pu, pv, ptid,
                             pp, pu2, pv2, ptid2, pp2, Lp)
        carry = jax.lax.fori_loop(0, window, lambda _j, c: bounce_step(c),
                                  carry)
        (alive, pixel, sample, send, ro, rd, tme, bounce, L, Lsum, beta,
         useful) = carry[:12]
        iters = iters + 1

        if defer_tex:
            # round-end resolve: ONE fallback-texture pass pays every
            # pending slot.  texel * Lp is the sum of the contributions
            # the owing path made since the pending hit; it joins L (path
            # still running) or Lsum (owner path finished); the running
            # path's throughput also picks up the texel.  Stalled lanes'
            # spare slot shifts into the (now free) first slot and they
            # resume next round.
            (slot_busy, path_pend, stalled, pu, pv, ptid, pp,
             pu2, pv2, ptid2, pp2, Lp) = carry[12:]
            from .textures import texture_value
            tex = V3.from_rows(texture_value(data, meta, ptid, pu, pv,
                                             pp.to_rows()))
            add = tex * Lp
            Lsum = Lsum + v3.where(slot_busy & ~path_pend, add, 0.0)
            L = L + v3.where(slot_busy & path_pend, add, 0.0)
            beta = v3.where(slot_busy & path_pend, beta * tex, beta)
            pu = jnp.where(stalled, pu2, pu)
            pv = jnp.where(stalled, pv2, pv)
            ptid = jnp.where(stalled, ptid2, ptid)
            pp = v3.where(stalled, pp2, pp)
            slot_busy = stalled
            path_pend = stalled
            Lp = V3.zeros(P)
            stalled = jnp.zeros_like(stalled)

        # lanes whose chunk completed during the window deposit next round
        pend = entering & ~alive
        out_state = (counter, fb, alive, pend, pixel, sample, send, ro, rd,
                     tme, bounce, L, Lsum, beta, iters, useful)
        if defer_tex:
            out_state = out_state + (slot_busy, path_pend, stalled, pu, pv,
                                     ptid, pp, pu2, pv2, ptid2, pp2, Lp)
        return out_state

    def cond(state):
        counter, _fb, alive, pend = state[0], state[1], state[2], state[3]
        return (counter < total) | jnp.any(alive) | jnp.any(pend)

    state = (
        jnp.uint32(task_start),
        (fb[:, 0], fb[:, 1], fb[:, 2]),
        jnp.zeros(P, bool),
        jnp.zeros(P, bool),
        jnp.zeros(P, jnp.int32),
        jnp.zeros(P, jnp.int32),
        jnp.zeros(P, jnp.int32),
        V3.zeros(P),
        V3.ones(P),
        jnp.zeros(P, jnp.float32),
        jnp.zeros(P, jnp.int32),
        V3.zeros(P),
        V3.zeros(P),
        V3.ones(P),
        jnp.uint32(0),
        jnp.uint32(0),
    )
    if defer_tex:
        state = state + (
            jnp.zeros(P, bool),            # slot_busy: pending texel owed
            jnp.zeros(P, bool),            # path_pend: owing path running
            jnp.zeros(P, bool),            # stalled: spare slot occupied
            jnp.zeros(P, jnp.float32),     # pending u
            jnp.zeros(P, jnp.float32),     # pending v
            jnp.zeros(P, jnp.int32),       # pending texture row
            V3.zeros(P),                   # pending hit point
            jnp.zeros(P, jnp.float32),     # spare u
            jnp.zeros(P, jnp.float32),     # spare v
            jnp.zeros(P, jnp.int32),       # spare texture row
            V3.zeros(P),                   # spare hit point
            V3.zeros(P),                   # Lp: contributions owing texel
        )
    state = jax.lax.while_loop(cond, body, state)
    return jnp.stack(state[1], axis=-1), state[14], state[15]


@functools.partial(jax.jit,
                   static_argnames=("meta", "pool", "chunk", "window",
                                    "use_pallas", "spt", "per",
                                    "pallas_interpret", "pallas_accel",
                                    "no_defocus", "defer_tex"),
                   donate_argnums=(3,))
def _wavefront_span(data: SceneData, cam: Camera, seed, fb, task_start,
                    task_end, *, meta: SceneMeta, pool: int, chunk: int,
                    window: int, use_pallas: bool, spt: int, per: int,
                    pallas_interpret: bool = False, pallas_accel=None,
                    no_defocus: bool = False, defer_tex: bool = False):
    """Single-device span (n_shards == 1)."""
    return _span_core(data, cam, seed, fb, task_start, task_end,
                      jnp.int32(0), meta=meta, pool=pool, chunk=chunk,
                      window=window, use_pallas=use_pallas, spt=spt,
                      per=per, n_shards=1,
                      pallas_interpret=pallas_interpret,
                      pallas_accel=pallas_accel, no_defocus=no_defocus,
                      defer_tex=defer_tex)


def _defer_tex_ok(data: SceneData, meta: SceneMeta) -> bool:
    """Static gate for the deferred-resolve texture mode: the scene must
    have fallback textures at all, none of them on an emissive material
    (emission needs the texel at hit time, primtable COL_E docstring),
    and fallback-textured surfaces must be a MINORITY of the geometry.
    When most surfaces carry image/perlin textures (earth,
    two_perlin_spheres), nearly every bounce sets a pending slot and
    second hits stall — measured occupancy 0.08 on two_perlin_spheres
    under deferral vs the 34%-of-round inline texture cost it was meant
    to avoid; inline evaluation wins there."""
    if meta.n_images == 0 and meta.n_noise == 0:
        return False
    from ..scene.types import MAT_DIFFUSE_LIGHT, TEX_CHECKER, TEX_SOLID
    mk = np.asarray(meta.mat_kind)
    tk = np.asarray(meta.tex_kind)
    tid = np.asarray(data.mat_tex)[:len(mk)]
    tkind = tk[tid]
    ce = np.asarray(data.tex_child_even)[tid]
    co = np.asarray(data.tex_child_odd)[tid]
    checker_solid = ((tkind == TEX_CHECKER)
                     & (tk[ce] == TEX_SOLID) & (tk[co] == TEX_SOLID))
    fallback = (tkind != TEX_SOLID) & ~checker_solid
    if bool(((mk == MAT_DIFFUSE_LIGHT) & fallback).any()):
        return False
    # prim-weighted fallback fraction over the surface geometry
    n_fb = n_surf = 0
    for mats, surf in ((data.sph_mat, data.sph_surface),
                       (data.quad_mat, data.quad_surface)):
        m = np.asarray(mats)
        s = np.asarray(surf).astype(bool)
        if m.size:
            n_surf += int(s.sum())
            n_fb += int((fallback[m] & s).sum())
    return n_surf > 0 and n_fb <= n_surf // 4


@functools.lru_cache(maxsize=16)
def _sharded_span(mesh, meta, pool, chunk, window, use_pallas, spt, per,
                  pallas_interpret=False, pallas_accel=None,
                  no_defocus=False, defer_tex=False):
    """jitted shard_map'ed span over a 1-D 'rays' mesh.

    Scene/camera replicated; fb row-sharded; zero collectives (the forward
    pass is embarrassingly parallel, like the reference's pixel grid).
    Per-shard iteration/occupancy stats come back as [n_shards] arrays for
    load-balance diagnostics.
    """
    from jax.sharding import PartitionSpec as P
    n = mesh.devices.size
    axes = tuple(mesh.axis_names)   # ("rays",) or ("dcn", "ici")

    def per_device(data, cam, seed, fb, t0, t1):
        # flattened outer-major shard index over every mesh axis — matches
        # how P(axes) deals the leading dim across the device grid
        sid = jnp.int32(0)
        for ax in axes:
            sid = sid * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        fb, iters, useful = _span_core(
            data, cam, seed, fb, t0, t1, sid, meta=meta, pool=pool,
            chunk=chunk, window=window, use_pallas=use_pallas, spt=spt,
            per=per, n_shards=n,
            pallas_interpret=pallas_interpret, pallas_accel=pallas_accel,
            no_defocus=no_defocus, defer_tex=defer_tex)
        return fb, iters[None], useful[None]

    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(P(), P(), P(), P(axes), P(), P()),
                       out_specs=(P(axes), P(axes), P(axes)),
                       check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def default_pool(meta: SceneMeta, n_pixels: int) -> int:
    # Big-scene pools: 2^16 measured faster than 2^17 on final_scene at
    # both the 961-spp bench config (5.26 vs 5.22 M paths/s, occ 0.847 vs
    # 0.828) and a 16-spp span (4.43 vs 3.97) — per-round deposit/resolve
    # costs scale with the pool while the kernel work does not, and the
    # smaller pool drains its task tail faster.
    n_prims = max(1, meta.n_spheres + meta.n_quads)
    pool = 1 << 18 if n_prims <= 1024 else 1 << 16
    return min(pool, max(1024, -(-n_pixels // 1024) * 1024))


def render_wavefront(data: SceneData, meta: SceneMeta, cam: Camera,
                     seed=DEFAULT_SEED, pool=None, chunk=512,
                     max_paths_per_call=200_000_000, fb=None, task_range=None,
                     scrub_nan=True, window=None, use_pallas=None, spt=None,
                     mesh=None, layer_range=None,
                     pallas_interpret=False, pallas_accel=None,
                     return_stats=False):
    """Wavefront render; returns linear [H,W,3] (row 0 = bottom).

    The task space — W*H pixels x ceil(spp/spt) sample-chunks — is split
    into spans of at most ``max_paths_per_call`` camera paths per device
    execution.  ``fb`` / ``task_range`` (in chunk-task units) allow external
    accumulation (progressive / checkpoint); pass ``scrub_nan=False`` to get
    the raw resumable accumulator back (canonical pixel order at any mesh
    size).

    ``mesh``: optional 1-D device mesh (parallel.sharding.make_mesh); pixels
    are round-robin sharded over it and the render is bit-identical for any
    mesh size (module docstring).  ``layer_range`` (in sample-chunk layers)
    replaces ``task_range`` for sharded/progressive accumulation; spans are
    then layer-aligned so each pixel deposits exactly once per layer.

    ``return_stats``: return ``(img, stats)`` where stats carries iteration
    counts, useful-segment totals, occupancy inputs and (mesh mode) the
    per-shard useful-segment balance.  No module-level state is mutated.
    """
    W, H = cam.image_width, cam.image_height
    WH = W * H
    spp = cam.sqrt_spp ** 2
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if spt is None:
        # Straggler tail: after the last task is claimed, the worst lane
        # still owes ~spt * bounce_limit bounce steps at collapsing
        # occupancy, so deep scenes want short chunks.  Measured (TPU v5e,
        # tools/tune_wavefront.py): scene 1 (depth 20) 20.4 -> 22.6 M
        # paths/s going spt 16 -> 8; scene 8 (depth 40) best at spt 4.
        spt = min(spp, 4 if cam.bounce_limit >= 32 else 8)
    if window is None:
        # Deep scenes also profit from more frequent deposit/refill rounds
        # (occ 0.809 -> 0.881 on scene 8 at window 4); shallow scenes lose
        # more to the per-round refill cost than they gain.
        deep = cam.bounce_limit >= 32
        window = (4 if deep else 8) if use_pallas else 3
        if spp == 1:
            # a 1-spp chunk is a single path: once it dies the lane cannot
            # respawn until the round refill, so long windows run mostly
            # dead slots (scene 10: occ 0.078 -> 0.21, 4.35 -> 5.61 M
            # paths/s at window 3)
            window = min(window, 3)
    n_chunks = -(-spp // spt)
    # static zero-aperture flag: skips the SLOT_CAM_LENS philox block +
    # disk math in respawn (unobservable — the oracle ignores those draws
    # at defocus 0; see camera.get_rays_soa)
    no_defocus = bool(np.asarray(cam.defocus_angle) <= 0.0)
    defer_tex = _defer_tex_ok(data, meta)
    stats = {"iterations": 0, "useful_segments": 0, "slots_executed": 0}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert task_range is None, "use layer_range with a mesh"
        n = int(mesh.devices.size)
        per = -(-WH // n)
        if pool is None:
            pool = default_pool(meta, per)
        l0, l1 = layer_range if layer_range is not None else (0, n_chunks)
        g = np.arange(WH)
        rows = (g % n) * per + g // n    # canonical pixel -> interleaved row
        if fb is None:
            fb = jnp.zeros((n * per, 3), jnp.float32)
        else:
            # fb is in CANONICAL [W*H, 3] global pixel order (so a partial
            # accumulation checkpointed on one mesh size can resume on any
            # other); interleave it into the round-robin shard layout.
            inter = np.zeros((n * per, 3), np.float32)
            inter[rows] = np.asarray(fb).reshape(WH, 3)
            fb = jnp.asarray(inter)
        fb = jax.device_put(fb, NamedSharding(mesh, P(tuple(mesh.axis_names))))
        repl = NamedSharding(mesh, P())
        data = jax.device_put(data, repl)
        cam_d = jax.device_put(cam, repl)
        span = _sharded_span(mesh, meta, int(pool), int(chunk), int(window),
                             bool(use_pallas), int(spt), int(per),
                             bool(pallas_interpret), pallas_accel,
                             no_defocus, defer_tex)
        tasks_per_call = max(pool, max_paths_per_call // spt)
        shard_useful = None
        for c in range(l0, l1):
            for s0 in range(c * per, (c + 1) * per, tasks_per_call):
                s1 = min(s0 + tasks_per_call, (c + 1) * per)
                fb, iters, useful = span(data, cam_d, jnp.uint32(seed), fb,
                                         jnp.uint32(s0), jnp.uint32(s1))
                iters, useful = np.asarray(iters), np.asarray(useful)
                stats["iterations"] += int(iters.max())
                stats["useful_segments"] += int(useful.sum())
                stats["slots_executed"] += (int(iters.sum()) * int(window)
                                            * int(pool))
                shard_useful = (useful if shard_useful is None
                                else shard_useful + useful)
        stats["per_shard_useful"] = ([] if shard_useful is None
                                     else shard_useful.tolist())
        out = np.asarray(fb)[rows]          # undo round-robin interleave
        if scrub_nan:
            out = np.where(np.isnan(out), 0.0, out)
        img = jnp.asarray(out.reshape(H, W, 3))
        return (img, stats) if return_stats else img

    if pool is None:
        pool = default_pool(meta, WH)
    if fb is None:
        fb = jnp.zeros((WH, 3), jnp.float32)
    tasks_per_call = max(pool, max_paths_per_call // spt)

    if layer_range is not None:
        assert task_range is None, "layer_range and task_range are exclusive"
        spans = []
        for c in range(*layer_range):
            for s0 in range(c * WH, (c + 1) * WH, tasks_per_call):
                spans.append((s0, min(s0 + tasks_per_call, (c + 1) * WH)))
    else:
        start, end = task_range if task_range is not None else \
            (0, WH * n_chunks)
        spans = [(s0, min(s0 + tasks_per_call, end))
                 for s0 in range(start, end, tasks_per_call)]

    for s0, s1 in spans:
        fb, iters, useful = _wavefront_span(
            data, cam, jnp.uint32(seed), fb,
            jnp.uint32(s0), jnp.uint32(s1),
            meta=meta, pool=int(pool), chunk=int(chunk),
            window=int(window), use_pallas=bool(use_pallas), spt=int(spt),
            per=WH, pallas_interpret=bool(pallas_interpret),
            pallas_accel=pallas_accel, no_defocus=no_defocus,
            defer_tex=defer_tex)
        stats["iterations"] += int(iters)
        stats["useful_segments"] += int(useful)
        stats["slots_executed"] += int(iters) * int(window) * int(pool)
    if scrub_nan:
        fb = jnp.where(jnp.isnan(fb), 0.0, fb)
    img = fb.reshape(H, W, 3)
    return (img, stats) if return_stats else img
