"""Vectorised texture evaluation (the valueDispatch analogue,
textures.cuh:327-349).

Dispatch over texture kinds happens by masked evaluation of each kind that
is actually present in the scene (static SceneMeta flags prune dead
branches at trace time), never by per-ray control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.build import SceneData, SceneMeta
from ..scene.types import TEX_CHECKER, TEX_IMAGE, TEX_NOISE, TEX_SOLID


# Lattice-hash constants (three large odd multipliers + an avalanche mix).
_HX = 0x8DA6B343
_HY = 0xD8163841
_HZ = 0xCB1AB31F
_HM = 0x9E3779B1


def _hash3(i, j, k, salt):
    """Gather-free lattice hash: the TPU replacement for the reference's
    permutation-table xor (textures.cuh:189-192).  Table gathers are
    catastrophically slow on TPU (no vector gather unit); an integer
    avalanche hash of the lattice coordinates gives the same
    "random value per lattice point" semantics in pure VPU ops."""
    h = (i.astype(jnp.uint32) * jnp.uint32(_HX)
         ^ j.astype(jnp.uint32) * jnp.uint32(_HY)
         ^ k.astype(jnp.uint32) * jnp.uint32(_HZ)) + jnp.uint32(salt)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(_HM)
    return h ^ (h >> jnp.uint32(16))


# Edge-direction gradients have length sqrt(2); the reference gathers random
# UNIT vectors (textures.cuh:192, 246-249).  Normalising by 1/sqrt(2) makes
# the two noise fields agree in amplitude (mean/std — enforced by
# tests/test_perlin_stats.py), not just in spatial character.
_INV_SQRT2 = 0.7071067811865476


def _grad_dot(h, wx, wy, wz):
    """Dot of a hashed gradient with the corner weight vector, using the
    12-edge-direction gradient set of improved Perlin noise (components in
    {-1,0,1}, scaled to unit length) — branchless selects instead of the
    reference's gathered random unit vectors (textures.cuh:192, 246-249)."""
    hh = h & jnp.uint32(15)
    u = jnp.where(hh < 8, wx, wy)
    v = jnp.where(hh < 4, wy,
                  jnp.where((hh == 12) | (hh == 14), wx, wz))
    u = jnp.where((h & jnp.uint32(1)) != 0, -u, u)
    v = jnp.where((h & jnp.uint32(2)) != 0, -v, v)
    return (u + v) * jnp.float32(_INV_SQRT2)


def _perlin_noise(p, salt):
    """Perlin noise with the reference's (double-)smoothing semantics
    (textures.cuh:174-196 + 232-250: noise() Hermite-smooths u/v/w, then
    perlin_interp smooths them again for the lattice weights while the
    gradient offset vectors use the once-smoothed values).  Lattice
    randomness is the hash above instead of gathered tables — same
    algorithm, TPU-native realisation.

    The corner hashes share their lattice products: (i+1)*H == i*H + H in
    modular uint32 arithmetic, so the 8 corners need 3 multiplies + 3 adds
    for the lattice terms (instead of 24 multiplies) + 8 avalanche mixes —
    integer multiply chains are the TPU VPU's slowest op (measured ~40x an
    add), and this is bit-identical to hashing each corner independently.

    p: [R,3] -> [R]
    """
    pf = jnp.floor(p)
    uvw = p - pf                      # raw fractional part
    uvw1 = uvw * uvw * (3.0 - 2.0 * uvw)   # smoothed once (textures.cuh:179-181)
    ijk = pf.astype(jnp.int32)

    uu = uvw1 * uvw1 * (3.0 - 2.0 * uvw1)  # smoothed twice (textures.cuh:234-236)
    hx0 = ijk[..., 0].astype(jnp.uint32) * jnp.uint32(_HX)
    hy0 = ijk[..., 1].astype(jnp.uint32) * jnp.uint32(_HY)
    hz0 = ijk[..., 2].astype(jnp.uint32) * jnp.uint32(_HZ)
    hx = (hx0, hx0 + jnp.uint32(_HX))
    hy = (hy0, hy0 + jnp.uint32(_HY))
    hz = (hz0, hz0 + jnp.uint32(_HZ))
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                h = (hx[di] ^ hy[dj] ^ hz[dk]) + jnp.uint32(salt)
                h = h ^ (h >> jnp.uint32(13))
                h = h * jnp.uint32(_HM)
                h = h ^ (h >> jnp.uint32(16))
                coeff = (
                    (di * uu[..., 0] + (1 - di) * (1.0 - uu[..., 0]))
                    * (dj * uu[..., 1] + (1 - dj) * (1.0 - uu[..., 1]))
                    * (dk * uu[..., 2] + (1 - dk) * (1.0 - uu[..., 2]))
                )
                gd = _grad_dot(h, uvw1[..., 0] - di, uvw1[..., 1] - dj,
                               uvw1[..., 2] - dk)
                accum = accum + coeff * gd
    return accum


def _turbulence(p, salt, depth=7):
    """Sum of |octaves| (textures.cuh:252-265)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * _perlin_noise(temp_p, salt)
        weight *= 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)


def _take_rows(arr, tid, T):
    """Branchless small-table row lookup: arr[tid] for a table of T rows.

    TPU has no vector gather unit — XLA lowers ``arr[tid]`` to a serial
    ~1 element/cycle gather, which at a 2^17 lane pool costs more than the
    whole shading math.  For the texture registries (T is the static number
    of textures, single digits for every reference scene) a chain of
    compare-selects is pure fusable VPU work.
    """
    out = jnp.broadcast_to(arr[0], tid.shape + arr.shape[1:])
    for k in range(1, T):
        sel = tid == k
        if arr.ndim > 1:
            sel = sel[..., None]
        out = jnp.where(sel, arr[k], out)
    return out


def _base_value(data: SceneData, meta: SceneMeta, kind_arr, tid, u, v, p):
    """Evaluate non-checker textures at texture rows ``tid`` [R]."""
    T = len(meta.tex_kind)
    kinds = _take_rows(kind_arr, tid, T)
    out = _take_rows(data.tex_color, tid, T)  # solid_color (textures.cuh:24-27)

    if meta.n_images > 0:
        img_ids = _take_rows(data.tex_image_id, tid, T)
        uc = jnp.clip(u, 0.0, 1.0)
        vc = 1.0 - jnp.clip(v, 0.0, 1.0)  # flip V (textures.cuh:133-134)
        exact = meta.images_u8_exact or (True,) * meta.n_images
        for img_id in range(meta.n_images):
            H, W = data.images[img_id].shape[0], data.images[img_id].shape[1]
            i = jnp.clip((uc * W).astype(jnp.int32), 0, W - 1)
            j = jnp.clip((vc * H).astype(jnp.int32), 0, H - 1)
            if exact[img_id]:
                img = data.images_packed[img_id]  # [H,W] u32 (SceneData note)
                texel = img[j, i]                 # ONE gather per lane
                val = jnp.stack(
                    [((texel >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32),
                     ((texel >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32),
                     (texel & jnp.uint32(0xFF)).astype(jnp.float32)],
                    axis=-1) / jnp.float32(255.0)  # f32 divide: bit-matches
                # the u8/255 values the unpacked f32 images hold
            else:
                # float/HDR image: 8-bit packing would silently degrade it,
                # so pay three per-channel gathers for full-precision texels
                val = data.images[img_id][j, i]
            sel = (kinds == TEX_IMAGE) & (img_ids == img_id)
            out = jnp.where(sel[..., None], val, out)

    if meta.n_noise > 0:
        noise_ids = _take_rows(data.tex_image_id, tid, T)
        scale = _take_rows(data.tex_noise_scale, tid, T)
        s = scale[..., None] * p
        for nid in range(meta.n_noise):
            # marble: 0.5*(1 + sin(s.z + 10*turb(s))) (textures.cuh:198-202)
            marble = 0.5 * (1.0 + jnp.sin(s[..., 2]
                                          + 10.0 * _turbulence(s, noise_salt(nid))))
            sel = (kinds == TEX_NOISE) & (noise_ids == nid)
            out = jnp.where(sel[..., None], marble[..., None] * jnp.ones(3, p.dtype), out)

    return out


def noise_salt(nid: int) -> int:
    """Per-noise-texture hash salt (each texture is an independent field,
    like the reference's per-texture permutation tables)."""
    return ((int(nid) + 1) * 0x51ED270B) & 0xFFFFFFFF


def texture_value(data: SceneData, meta: SceneMeta, tid, u, v, p):
    """Full texture dispatch incl. one checker nesting level
    (textures.cuh:327-349 + 52-60).  tid: [R] texture rows."""
    kind_arr = jnp.asarray(meta.tex_kind, jnp.int32)
    has_checker = TEX_CHECKER in meta.tex_kind
    if not has_checker:
        return _base_value(data, meta, kind_arr, tid, u, v, p)

    T = len(meta.tex_kind)
    kinds = _take_rows(kind_arr, tid, T)
    inv_scale = _take_rows(data.tex_inv_scale, tid, T)
    grid = jnp.floor(inv_scale[..., None] * p).astype(jnp.int32)
    is_even = (grid[..., 0] + grid[..., 1] + grid[..., 2]) % 2 == 0
    child = jnp.where(is_even, _take_rows(data.tex_child_even, tid, T),
                      _take_rows(data.tex_child_odd, tid, T))
    eff = jnp.where(kinds == TEX_CHECKER, child, tid)
    return _base_value(data, meta, kind_arr, eff, u, v, p)
