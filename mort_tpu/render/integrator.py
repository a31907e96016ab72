"""Wavefront path integrator.

The reference's per-thread recursion with global-memory scratch stacks
(camera.cuh:86-176: store {attenuation, emission, scattering_pdf, pdf} per
bounce, then unwind ``L = E + A*spdf*L/pdf``, camera.cuh:166-173) is folded
*forward*:

    L_0 = 0,  beta_0 = 1
    at bounce i:   L += beta_i * E_i ;   beta_{i+1} = beta_i * A_i*spdf_i/pdf_i
    on miss:       L += beta * background          (camera.cuh:154-158)
    on no-scatter: L += beta * emission, terminate (camera.cuh:148-151)
    depth exhausted: tail contributes 0            (camera.cuh:161-163)

which is algebraically identical to the unwind but needs O(1) memory in
bounce depth instead of the reference's bounce_limit*W*H scratch buffers
(mort.cu:712-725).  All rays advance in lockstep with masked lanes; the loop
exits early once every ray in the batch has terminated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera import Camera, CameraBasis, get_rays_soa
from ..scene.build import SceneData, SceneMeta
from .hitshade import finalize_and_shade
from .intersect import QuadFrames, intersect_best
from .primtable import build_prim_table
from . import vec as v3
from .vec import V3


def trace(data: SceneData, meta: SceneMeta, qf: QuadFrames, cam: Camera,
          basis: CameraBasis, seed, pixel_ids, sample_ids, chunk=512,
          differentiable=False, use_pallas=False, pallas_interpret=False,
          pallas_accel=None, prepacked=None):
    """Trace one camera sample for a batch of pixels; returns radiance [R,3].

    ``differentiable=True`` uses a static-trip-count fori_loop (reverse-mode
    differentiable); the default uses a while_loop that exits as soon as all
    rays in the batch have terminated.  ``use_pallas`` routes closest-hit
    through the fused kernel — including under reverse-mode AD (its custom
    VJP recomputes the winner analytically, pallas_intersect.py);
    ``pallas_interpret`` runs the kernel in interpret mode (CPU tests).
    ``prepacked`` (pallas_intersect.pack_for_kernel) lets callers that
    invoke trace inside their own loop hoist the scene packing out of it.
    """
    ro, rd, time = get_rays_soa(cam, basis, seed, pixel_ids, sample_ids)
    R = pixel_ids.shape[0]
    table, mat_cols = build_prim_table(data, meta, qf)
    if use_pallas and prepacked is None:
        from . import pallas_intersect as pal
        # table packing hoisted out of the bounce loop (pack_for_kernel
        # docstring); under AD the pack VJP also runs once, not per bounce
        prepacked = pal.pack_for_kernel(data, meta, qf, table,
                                        interpret=pallas_interpret,
                                        accel=pallas_accel)
    bg = cam.background

    def fold(state, bt, bk, bi, row_t):
        """Everything after closest-hit: media, shade, radiance fold.  Pure
        VPU work — the rematerializable part of a bounce."""
        bounce, L, beta, alive, ro, rd = state
        if use_pallas and meta.media:
            from .intersect import T_MIN, media_pass
            bt, bk, bi = media_pass(data, meta, qf, ro, rd, seed,
                                    pixel_ids, sample_ids, bounce, T_MIN,
                                    bt, bk, bi)
        out = finalize_and_shade(data, meta, qf, table, mat_cols, ro, rd,
                                 time, bt, bk, bi, seed,
                                 pixel_ids, sample_ids, bounce, row_t=row_t)

        miss = alive & ~out.hit
        L = L + v3.where(miss, beta * V3(bg[0], bg[1], bg[2]), 0.0)

        terminated = alive & out.hit & ~out.scatter_ok
        L = L + v3.where(terminated, beta * out.emission, 0.0)

        cont = alive & out.hit & out.scatter_ok
        # skip_pdf bounces store zero emission (camera.cuh:107-110).
        L = L + v3.where(cont & ~out.skip_pdf, beta * out.emission, 0.0)
        beta = v3.where(cont, beta * out.weight, beta)

        ro = v3.where(cont, out.p, ro)
        rd = v3.where(cont, out.new_dir, rd)
        return bounce + 1, L, beta, cont, ro, rd

    if differentiable:
        # Rematerialize the post-kernel part of each bounce in the
        # backward: without this, reverse mode stacks every bounce's
        # intermediates ([R]-sized ray/shading tensors x bounce_limit) and
        # the backward becomes residual-traffic bound — profiled at ~25x
        # the kernel time on the chip.  The closest-hit kernel itself
        # stays OUTSIDE the checkpoint: custom_vjp calls are opaque to
        # partial-eval, so a whole-body checkpoint re-executes the kernel
        # once per bounce in the backward (measured 26 ms of a ~200 ms
        # step); with the split, the kernel's outputs/residuals (a few
        # [R] rows) are saved and only the cheap VPU fold recomputes.
        fold = jax.checkpoint(fold)

    def body(state):
        bounce, L, beta, alive, ro, rd = state
        if use_pallas:
            from . import pallas_intersect as pal
            bt, bk, bi, row_t = pal.closest_hit_pallas(
                data, meta, qf, table, ro, rd, time,
                interpret=pallas_interpret, accel=pallas_accel,
                prepacked=prepacked)
        else:
            bt, bk, bi = intersect_best(data, meta, qf, ro.to_rows(),
                                        rd.to_rows(), time, seed, pixel_ids,
                                        sample_ids, bounce, chunk=chunk)
            row_t = None
        return fold(state, bt, bk, bi, row_t)

    def cond(state):
        bounce, _L, _beta, alive, _ro, _rd = state
        return (bounce < cam.bounce_limit) & jnp.any(alive)

    state = (jnp.int32(0), V3.zeros(R), V3.ones(R), jnp.ones(R, bool), ro, rd)
    if differentiable:
        state = jax.lax.fori_loop(0, cam.bounce_limit,
                                  lambda _i, s: body(s), state)
    else:
        state = jax.lax.while_loop(cond, body, state)
    return state[1].to_rows()
