"""Counter-based RNG for the TPU path tracer.

The reference renderer (mort) keeps one mutable curandState per pixel, seeded
with ``curand_init(69420, pixel_offset, 0)`` (reference: rng.cuh:8-15,
mort.cu:706-709) and every draw is a load-modify-store of that state
(rng.cuh:17-23).  Mutable per-pixel state is hostile to SPMD re-ordering and
to differentiation, so the TPU rebuild replaces it with a *stateless*
counter-based generator: every random draw is a pure function

    u = philox4x32(counter=(pixel, sample, bounce+1, slot), key=(seed, SEED2))

so that any re-batching, sharding or wavefront compaction of rays produces
bit-identical samples.  This is also what makes renders reproducible across
1 chip / N chips and perturbation-stable for finite-difference gradient
checks (see SURVEY.md section 3.4).

Philox4x32-10 (Salmon et al., "Parallel random numbers: as easy as 1, 2, 3")
is implemented twice with identical bit-level semantics:

* :func:`philox4x32` — jax.numpy, fully vectorised, used on device.
* :func:`philox4x32_np` — numpy, used by the slow CPU oracle in ``tests/``.

Only uint32 arithmetic is used (JAX x64 stays disabled); the 32x32->64 bit
products are synthesised from 16-bit limbs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Philox4x32 round constants.
PHILOX_M0 = 0xD2511F53
PHILOX_M1 = 0xCD9E8D57
PHILOX_W0 = 0x9E3779B9
PHILOX_W1 = 0xBB67AE85
PHILOX_ROUNDS = 10

# Second key word; the first is the user seed (reference default 69420,
# mort.cu:707).
SEED2 = 0xC0FFEE42
DEFAULT_SEED = 69420

# ---------------------------------------------------------------------------
# Draw-slot layout
# ---------------------------------------------------------------------------
# Each philox call yields 4 uniforms; draws are grouped by purpose into
# "slots" so the wavefront renderer and the CPU oracle consume identical
# random numbers regardless of evaluation order.  Camera-level draws use
# bounce counter 0; per-bounce draws use bounce counter (1 + bounce).

SLOT_CAM_PIXEL = 0      # (jitter_x, jitter_y, time, _)        camera.cuh:210-220
SLOT_CAM_LENS = 1       # (defocus_u, defocus_v, _, _)         camera.cuh:230-234

SLOT_MIX = 0            # (mixture_choice, light_pick, dielectric_u, _)
SLOT_MAT_DIR = 1        # (u1, u2, _, _) cosine / isotropic direction
SLOT_LIGHT_DIR = 2      # (u1, u2, _, _) light sphere-cone / quad sample
SLOT_FUZZ = 3           # (u1, u2, _, _) metal fuzz unit vector
SLOT_MEDIUM0 = 4        # one block; medium m reads word m (m < MAX_MEDIA)
MAX_MEDIA = 4
SLOTS_PER_BOUNCE = SLOT_MEDIUM0 + 1


def _mulhilo_jnp(a, b):
    """(hi, lo) words of the 64-bit product of two uint32 arrays, in uint32.

    ``lo`` is recomposed from the 16-bit limb products ((v & 0xFFFF) << 16 |
    (t & 0xFFFF) == a*b mod 2^32) instead of a fifth full-width multiply —
    u32 multiplies are the TPU VPU's most expensive op, and the limb
    recomposition is bit-identical."""
    a = a.astype(jnp.uint32)
    b = jnp.uint32(b)
    ah, al = a >> 16, a & 0xFFFF
    bh, bl = b >> 16, b & 0xFFFF
    t = al * bl
    u = ah * bl + (t >> 16)
    v = al * bh + (u & 0xFFFF)
    hi = ah * bh + (u >> 16) + (v >> 16)
    lo = ((v & 0xFFFF) << 16) | (t & 0xFFFF)
    return hi, lo


def philox4x32(c0, c1, c2, c3, k0, k1):
    """One philox4x32-10 block: 4 uint32 streams from 4 counter words."""
    c0 = jnp.asarray(c0, jnp.uint32)
    c1 = jnp.asarray(c1, jnp.uint32)
    c2 = jnp.asarray(c2, jnp.uint32)
    c3 = jnp.asarray(c3, jnp.uint32)
    k0 = jnp.uint32(k0)
    k1 = jnp.uint32(k1)
    for _ in range(PHILOX_ROUNDS):
        hi0, lo0 = _mulhilo_jnp(c0, PHILOX_M0)
        hi1, lo1 = _mulhilo_jnp(c2, PHILOX_M1)
        c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
        k0 = k0 + jnp.uint32(PHILOX_W0)
        k1 = k1 + jnp.uint32(PHILOX_W1)
    return c0, c1, c2, c3


def _bits_to_unit(x):
    # 24-bit mantissa -> [0, 1).  float32 exact.
    return (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform4(seed, pixel, sample, bounce_plus1, slot):
    """Four independent uniforms in [0, 1) for the given counter.

    ``pixel``/``sample`` may be arrays (broadcast together); ``bounce_plus1``
    and ``slot`` are usually python ints (0 = camera-level draws).
    """
    r0, r1, r2, r3 = philox4x32(pixel, sample, bounce_plus1, slot, seed, SEED2)
    return _bits_to_unit(r0), _bits_to_unit(r1), _bits_to_unit(r2), _bits_to_unit(r3)


# ---------------------------------------------------------------------------
# NumPy mirror (CPU oracle)
# ---------------------------------------------------------------------------

def _mulhilo_np(a, b):
    a = np.asarray(a, np.uint32)
    b = np.uint32(b)
    with np.errstate(over="ignore"):
        lo = a * b
        ah, al = a >> np.uint32(16), a & np.uint32(0xFFFF)
        bh, bl = b >> np.uint32(16), b & np.uint32(0xFFFF)
        t = al * bl
        u = ah * bl + (t >> np.uint32(16))
        v = al * bh + (u & np.uint32(0xFFFF))
        hi = ah * bh + (u >> np.uint32(16)) + (v >> np.uint32(16))
    return hi, lo


def philox4x32_np(c0, c1, c2, c3, k0, k1):
    c0 = np.asarray(c0, np.uint32)
    c1 = np.asarray(c1, np.uint32)
    c2 = np.asarray(c2, np.uint32)
    c3 = np.asarray(c3, np.uint32)
    k0 = np.uint32(k0)
    k1 = np.uint32(k1)
    with np.errstate(over="ignore"):
        for _ in range(PHILOX_ROUNDS):
            hi0, lo0 = _mulhilo_np(c0, PHILOX_M0)
            hi1, lo1 = _mulhilo_np(c2, PHILOX_M1)
            c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
            k0 = np.uint32((int(k0) + PHILOX_W0) & 0xFFFFFFFF)
            k1 = np.uint32((int(k1) + PHILOX_W1) & 0xFFFFFFFF)
    return c0, c1, c2, c3


def uniform4_np(seed, pixel, sample, bounce_plus1, slot):
    r = philox4x32_np(pixel, sample, bounce_plus1, slot, seed, SEED2)
    return tuple((w >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24)) for w in r)
