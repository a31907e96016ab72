"""Top-level render driver: batches pixels, loops strata, post-processes.

Replaces the reference's per-frame megakernel launch (mort.cu:93-120,
camera.cuh:178-208) with a jit-compiled loop: pixel batches x stratified
samples, radiance accumulated in a float32 framebuffer.  Post-processing
matches camera.cuh:194-207 exactly: mean over sqrt_spp^2 samples, NaN scrub,
gamma-2 (sqrt, utils.h:41-43), clamp to [0, 0.999], u8 pack.

The framebuffer convention is [H, W, 3] with row 0 at the *bottom* (the
reference renders into a bottom-up GL buffer); image writers flip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, derive_basis
from ..rng import DEFAULT_SEED
from ..scene.build import SceneData, SceneMeta
from .integrator import trace
from .intersect import quad_frames


def _pick_ray_batch(meta: SceneMeta, n_pixels: int) -> int:
    """Heuristic ray batch size: keep [batch, chunk] intermediates ~tens of MB."""
    n_prims = max(meta.n_spheres + meta.n_quads, 1)
    if n_prims <= 64:
        b = 1 << 17
    elif n_prims <= 1024:
        b = 1 << 16
    else:
        b = 1 << 15
    return min(b, max(1024, n_pixels))


def radiance_for_pixels(data: SceneData, meta: SceneMeta, cam: Camera, seed,
                        pixel_ids, chunk=512, differentiable=False,
                        sample_offset=0, n_samples=None, use_pallas=False,
                        pallas_interpret=False, pallas_accel=None):
    """Mean radiance over ``n_samples`` stratified samples for a flat pixel
    id array [P] -> [P,3].  The building block for both the single-chip
    batch loop and the sharded multi-chip path; ``sample_offset`` enables
    progressive accumulation / checkpoint-resume across calls."""
    spp = cam.sqrt_spp * cam.sqrt_spp
    if n_samples is None:
        n_samples = spp
    basis = derive_basis(cam)
    qf = quad_frames(data)
    P = pixel_ids.shape[0]
    prepacked = None
    if use_pallas:
        from .primtable import build_prim_table
        from . import pallas_intersect as pal
        # scene packing hoisted above the SAMPLE loop as well as the bounce
        # loop (pack_for_kernel docstring)
        table, _mat_cols = build_prim_table(data, meta, qf)
        prepacked = pal.pack_for_kernel(data, meta, qf, table,
                                        interpret=pallas_interpret,
                                        accel=pallas_accel)

    def sample_body(s, acc):
        sample_ids = jnp.full((P,), s, jnp.int32)
        return acc + trace(data, meta, qf, cam, basis, seed, pixel_ids,
                           sample_ids, chunk=chunk,
                           differentiable=differentiable,
                           use_pallas=use_pallas,
                           pallas_interpret=pallas_interpret,
                           pallas_accel=pallas_accel,
                           prepacked=prepacked)

    acc = jax.lax.fori_loop(sample_offset, sample_offset + n_samples,
                            sample_body, jnp.zeros((P, 3), jnp.float32))
    # Mean uses pixel_samples_scale = 1/sqrt_spp^2 (camera.cuh:52) so partial
    # accumulations sum to the reference estimator.
    return acc * (1.0 / spp)


@functools.partial(jax.jit, static_argnames=("meta", "ray_batch", "chunk",
                                             "differentiable", "use_pallas"))
def _render_flat(data: SceneData, cam: Camera, seed, *, meta: SceneMeta,
                 ray_batch: int, chunk: int, differentiable: bool,
                 use_pallas: bool = False):
    """Mean radiance per pixel, flat [W*H, 3] (pre-gamma linear)."""
    W, H = cam.image_width, cam.image_height
    WH = W * H

    B = min(ray_batch, WH) if WH < ray_batch else ray_batch
    n_batches = -(-WH // B)
    fb = jnp.zeros((n_batches * B, 3), jnp.float32)

    def batch_body(i, fb):
        pix = jnp.arange(B, dtype=jnp.int32) + i * B
        pix = jnp.minimum(pix, WH - 1)   # tail batch duplicates last pixel
        acc = radiance_for_pixels(data, meta, cam, seed, pix, chunk=chunk,
                                  differentiable=differentiable,
                                  use_pallas=use_pallas)
        return jax.lax.dynamic_update_slice(fb, acc, (i * B, 0))

    fb = jax.lax.fori_loop(0, n_batches, batch_body, fb)
    fb = fb[:WH]
    # NaN scrub (camera.cuh:196-198)
    fb = jnp.where(jnp.isnan(fb), 0.0, fb)
    return fb


def render(data: SceneData, meta: SceneMeta, cam: Camera, seed=DEFAULT_SEED,
           ray_batch=None, chunk=512, differentiable=False, use_pallas=None):
    """Render the scene; returns linear radiance image [H, W, 3] float32
    (row 0 = bottom)."""
    W, H = cam.image_width, cam.image_height
    if ray_batch is None:
        ray_batch = _pick_ray_batch(meta, W * H)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fb = _render_flat(data, cam, jnp.uint32(seed), meta=meta,
                      ray_batch=int(ray_batch), chunk=int(chunk),
                      differentiable=bool(differentiable),
                      use_pallas=bool(use_pallas))
    return fb.reshape(H, W, 3)


def to_u8(linear_img):
    """Gamma-2 + clamp + u8 pack (camera.cuh:200-207, utils.h:41-43)."""
    g = jnp.sqrt(jnp.maximum(linear_img, 0.0))
    return (256.0 * jnp.clip(g, 0.0, 0.999)).astype(jnp.uint8)


def to_u8_np(linear_img) -> np.ndarray:
    return np.asarray(to_u8(jnp.asarray(linear_img)))
