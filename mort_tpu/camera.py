"""Camera model: viewport setup, stratified sampling, defocus blur.

Behavioural parity with the reference Camera (camera.cuh:12-243):

* ``initialize`` semantics (camera.cuh:47-84) are split in two: static image
  geometry (width/height/sqrt_spp) is fixed at construction, while the
  differentiable basis (lookfrom/lookat/vfov/defocus/focus_dist -> pixel00,
  pixel deltas, defocus disk) is derived *inside* the traced computation by
  :func:`derive_basis`, so pixel gradients flow to camera parameters.

* Stratified sampling truncates spp to a perfect square:
  ``sqrt_spp = int(sqrt(spp))``, scale ``1/sqrt_spp**2`` (camera.cuh:51-53)
  — e.g. nominal 500 spp renders 484 samples, matching the reference.

* ``get_rays`` (camera.cuh:210-220) consumes counter-RNG draws: pixel jitter
  + ray time from SLOT_CAM_PIXEL, defocus-disk point from SLOT_CAM_LENS.
  The rejection-sampled unit disk (vec3.cuh:162-169) is replaced by the
  exact polar transform (r = sqrt(u), theta = 2*pi*v) — identical
  distribution, zero divergence, differentiable.

Pixel convention: x in [0,W), y in [0,H) with y increasing *upward* (the
reference renders into a GL bottom-up framebuffer; gpu_anim.h draws row 0 at
the bottom).  Image writers flip rows for top-down formats.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import struct

from .rng import SLOT_CAM_LENS, SLOT_CAM_PIXEL, uniform4


@struct.dataclass
class Camera:
    # Differentiable parameters.
    lookfrom: Any
    lookat: Any
    vup: Any
    vfov: Any            # degrees
    defocus_angle: Any   # degrees
    focus_dist: Any
    background: Any      # flat miss color (camera.cuh:22; NOT a sky gradient)
    # Static geometry / sampling config.
    image_width: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)
    sqrt_spp: int = struct.field(pytree_node=False)
    bounce_limit: int = struct.field(pytree_node=False)


def make_camera(
    *,
    aspect_ratio: float = 1.0,
    image_width: int = 400,
    samples_per_pixel: int = 50,
    bounce_limit: int = 10,
    vfov: float = 90.0,
    lookfrom=(0.0, 0.0, 1.0),
    lookat=(0.0, 0.0, 0.0),
    vup=(0.0, 1.0, 0.0),
    defocus_angle: float = 0.0,
    focus_dist: float = 10.0,
    background=(0.70, 0.80, 1.00),
) -> Camera:
    image_height = max(1, int(image_width / aspect_ratio))
    sqrt_spp = max(1, int(math.sqrt(samples_per_pixel)))
    return Camera(
        lookfrom=jnp.asarray(lookfrom, jnp.float32),
        lookat=jnp.asarray(lookat, jnp.float32),
        vup=jnp.asarray(vup, jnp.float32),
        vfov=jnp.float32(vfov),
        defocus_angle=jnp.float32(defocus_angle),
        focus_dist=jnp.float32(focus_dist),
        background=jnp.asarray(background, jnp.float32),
        image_width=image_width,
        image_height=image_height,
        sqrt_spp=sqrt_spp,
        bounce_limit=bounce_limit,
    )


@struct.dataclass
class CameraBasis:
    center: Any
    pixel00_loc: Any
    pixel_delta_u: Any
    pixel_delta_v: Any
    defocus_disk_u: Any
    defocus_disk_v: Any
    use_defocus: Any      # scalar bool (defocus_angle > 0, camera.cuh:215)


def _unit(v):
    return v / jnp.linalg.norm(v)


def derive_basis(cam: Camera) -> CameraBasis:
    """Traced equivalent of Camera::initialize (camera.cuh:47-84)."""
    W, H = cam.image_width, cam.image_height
    theta = jnp.deg2rad(cam.vfov)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h * cam.focus_dist
    viewport_width = viewport_height * (W / H)

    w = _unit(cam.lookfrom - cam.lookat)
    u = _unit(jnp.cross(cam.vup, w))
    v = jnp.cross(w, u)

    viewport_u = viewport_width * u
    viewport_v = viewport_height * -v
    pixel_delta_u = viewport_u / W
    pixel_delta_v = -viewport_v / H

    center = cam.lookfrom
    viewport_upper_left = center - cam.focus_dist * w - viewport_u / 2 + viewport_v / 2
    pixel00_loc = viewport_upper_left + 0.5 * (pixel_delta_u + pixel_delta_v)

    defocus_radius = cam.focus_dist * jnp.tan(jnp.deg2rad(cam.defocus_angle / 2.0))
    return CameraBasis(
        center=center,
        pixel00_loc=pixel00_loc,
        pixel_delta_u=pixel_delta_u,
        pixel_delta_v=pixel_delta_v,
        defocus_disk_u=u * defocus_radius,
        defocus_disk_v=v * defocus_radius,
        use_defocus=cam.defocus_angle > 0,
    )


def get_rays_soa(cam: Camera, basis: CameraBasis, seed, pixel_ids, sample_ids,
                 no_defocus: bool = False):
    """Generate camera rays for flat pixel ids + stratified sample ids.

    pixel_id = x + y * W;  sample_id = s_i + s_j * sqrt_spp
    (camera.cuh:187-192, 210-220).  Returns (origin V3, dir V3, time [R]) in
    structure-of-arrays layout (see render/vec.py).  Directions are NOT
    normalised, as in the reference.

    ``no_defocus`` (static): callers that know defocus_angle == 0 outside
    the trace set it to skip the SLOT_CAM_LENS philox block and the disk
    math entirely — the CPU oracle likewise ignores that block's values at
    zero aperture, so skipping is unobservable (oracle.py:392-397), and
    integer-multiply-heavy philox blocks are among the costliest per-bounce
    ops on the TPU VPU.
    """
    from .render.vec import V3

    W = cam.image_width
    x = (pixel_ids % W).astype(jnp.float32)
    y = (pixel_ids // W).astype(jnp.float32)
    s_i = (sample_ids % cam.sqrt_spp).astype(jnp.float32)
    s_j = (sample_ids // cam.sqrt_spp).astype(jnp.float32)
    recip = jnp.float32(1.0 / cam.sqrt_spp)

    u1, u2, u_time, _ = uniform4(seed, pixel_ids, sample_ids, 0, SLOT_CAM_PIXEL)

    # sample_square_stratified (camera.cuh:236-242)
    sx = x + (s_i + u1) * recip - 0.5
    sy = y + (s_j + u2) * recip - 0.5

    p00, du, dv = basis.pixel00_loc, basis.pixel_delta_u, basis.pixel_delta_v
    pixel_sample = V3(p00[0] + sx * du[0] + sy * dv[0],
                      p00[1] + sx * du[1] + sy * dv[1],
                      p00[2] + sx * du[2] + sy * dv[2])

    # defocus_disk_sample (camera.cuh:230-234) with polar disk sampling.
    c = basis.center
    if no_defocus:
        zero = jnp.zeros_like(u_time)
        origin = V3(c[0] + zero, c[1] + zero, c[2] + zero)
        return origin, pixel_sample - origin, u_time
    d1, d2, _, _ = uniform4(seed, pixel_ids, sample_ids, 0, SLOT_CAM_LENS)
    r = jnp.sqrt(d1)
    phi = (2.0 * jnp.pi) * d2
    a = r * jnp.cos(phi)
    b = r * jnp.sin(phi)
    ku, kv = basis.defocus_disk_u, basis.defocus_disk_v
    disk = V3(c[0] + a * ku[0] + b * kv[0],
              c[1] + a * ku[1] + b * kv[1],
              c[2] + a * ku[2] + b * kv[2])
    zero = jnp.zeros_like(d1)
    center = V3(c[0] + zero, c[1] + zero, c[2] + zero)
    use = basis.use_defocus
    origin = V3(jnp.where(use, disk.x, center.x),
                jnp.where(use, disk.y, center.y),
                jnp.where(use, disk.z, center.z))
    direction = pixel_sample - origin
    return origin, direction, u_time


def get_rays(cam: Camera, basis: CameraBasis, seed, pixel_ids, sample_ids):
    """AoS wrapper over :func:`get_rays_soa`: returns ([R,3], [R,3], [R])."""
    ro, rd, t = get_rays_soa(cam, basis, seed, pixel_ids, sample_ids)
    return ro.to_rows(), rd.to_rows(), t
