"""Perlin deviation guard (DEVIATIONS.md section 1).

The repo's noise texture is a gather-free hash-lattice Perlin; the reference
uses gathered permutation tables + random unit gradients
(textures.cuh:158-266).  DEVIATIONS.md claims the two are *different random
processes with the same statistics*.  This test enforces that claim in CI:
a faithful NumPy port of the reference Perlin (same code as
tools/gen_deviations.py) and the hash-lattice noise are evaluated over the
same lattice patch and their marble-value statistics must agree.
"""

import numpy as np
import jax.numpy as jnp

from mort_tpu.render.textures import _perlin_noise, _turbulence, noise_salt


class RefPerlin:
    """Faithful port of the reference's perm-table Perlin
    (textures.cuh:158-266), seeded NumPy in place of libc rand()."""

    POINT_COUNT = 256

    def __init__(self, seed=69420):
        rng = np.random.RandomState(seed)
        v = rng.uniform(-1, 1, size=(self.POINT_COUNT, 3))
        self.ranvec = (v / np.linalg.norm(v, axis=1, keepdims=True))
        self.perm = [self._gen_perm(rng) for _ in range(3)]

    def _gen_perm(self, rng):
        arr = np.arange(self.POINT_COUNT)
        for i in range(self.POINT_COUNT - 1, 0, -1):  # permute() :221-228
            target = int(rng.uniform(0.0, i))
            arr[i], arr[target] = arr[target], arr[i]
        return arr

    def noise(self, p):
        pf = np.floor(p)
        u, v, w = (p - pf).T
        uu1 = u * u * (3 - 2 * u)       # smoothed once in noise() :177-181
        vv1 = v * v * (3 - 2 * v)
        ww1 = w * w * (3 - 2 * w)
        i, j, k = pf.astype(np.int64).T
        uu = uu1 * uu1 * (3 - 2 * uu1)  # smoothed again in perlin_interp
        vv = vv1 * vv1 * (3 - 2 * vv1)
        ww = ww1 * ww1 * (3 - 2 * ww1)
        px, py, pz = self.perm
        accum = np.zeros(len(p))
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    idx = (px[(i + di) & 255] ^ py[(j + dj) & 255]
                           ^ pz[(k + dk) & 255])
                    g = self.ranvec[idx]
                    weight = ((di * uu + (1 - di) * (1 - uu))
                              * (dj * vv + (1 - dj) * (1 - vv))
                              * (dk * ww + (1 - dk) * (1 - ww)))
                    gd = (g[:, 0] * (uu1 - di) + g[:, 1] * (vv1 - dj)
                          + g[:, 2] * (ww1 - dk))
                    accum += weight * gd
        return accum

    def turb(self, p, depth=7):
        accum = np.zeros(len(p))
        temp = p.copy()
        weight = 1.0
        for _ in range(depth):
            accum += weight * self.noise(temp)
            weight *= 0.5
            temp *= 2.0
        return np.abs(accum)

    def marble(self, p, scale):
        s = scale * p
        return 0.5 * (1.0 + np.sin(s[:, 2] + 10.0 * self.turb(s)))


def _patch(n=128, extent=4.0):
    xs, zs = np.meshgrid(np.linspace(0, extent, n), np.linspace(0, extent, n))
    return np.stack([xs.ravel(), np.zeros(n * n), zs.ravel()],
                    axis=1).astype(np.float64)


def test_single_octave_noise_stats():
    """Raw (double-smoothed) noise: zero-mean, matching spread and range."""
    p = _patch() * 3.0 + 0.37          # off-lattice sample points
    ref = RefPerlin().noise(p)
    ours = np.asarray(_perlin_noise(jnp.asarray(p, jnp.float32),
                                    noise_salt(0)))
    for tag, x in (("ref", ref), ("hash", ours)):
        assert abs(x.mean()) < 0.02, (tag, x.mean())
        assert abs(x) .max() <= 1.0, tag
    assert abs(ours.std() - ref.std()) < 0.035, (ours.std(), ref.std())


def test_marble_value_stats_match_reference():
    """Marble texture values (the quantity scenes actually consume,
    textures.cuh:198-202): mean/std/range of the hash-lattice field must
    match the faithful perm-table port over the same patch."""
    p = _patch()
    scale = 4.0
    ref = RefPerlin().marble(p, scale)
    s = scale * p
    ours = np.asarray(0.5 * (1.0 + jnp.sin(
        jnp.asarray(s[:, 2], jnp.float32)
        + 10.0 * _turbulence(jnp.asarray(s, jnp.float32), noise_salt(0)))))

    assert 0.0 <= ours.min() and ours.max() <= 1.0
    assert 0.0 <= ref.min() and ref.max() <= 1.0
    assert abs(ours.mean() - ref.mean()) < 0.03, (ours.mean(), ref.mean())
    assert abs(ours.std() - ref.std()) < 0.03, (ours.std(), ref.std())
    # both fields must actually vary (not degenerate/flat)
    assert ours.std() > 0.2 and ref.std() > 0.2


def test_turbulence_stats_match_reference():
    """7-octave turbulence (textures.cuh:252-265 semantics)."""
    p = _patch() * 2.0 + 0.11
    ref = RefPerlin().turb(p)
    ours = np.asarray(_turbulence(jnp.asarray(p, jnp.float32),
                                  noise_salt(0)))
    assert abs(ours.mean() - ref.mean()) < 0.05, (ours.mean(), ref.mean())
    assert abs(ours.std() - ref.std()) < 0.05, (ours.std(), ref.std())
