"""Generate docs/perlin_comparison.png: the repo's hash-lattice Perlin marble
next to a faithful NumPy port of the reference's permutation-table Perlin
(textures.cuh:158-266, with seeded NumPy in place of libc rand()).  The two
noise fields are *different random processes with the same statistics* —
this image pair documents the visual character of the deviation
(DEVIATIONS.md #1).

    python tools/gen_deviations.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


# --- reference-semantics Perlin (textures.cuh:158-266) ----------------------

class RefPerlin:
    POINT_COUNT = 256

    def __init__(self, seed=69420):
        rng = np.random.RandomState(seed)
        v = rng.uniform(-1, 1, size=(self.POINT_COUNT, 3))
        self.ranvec = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
        self.perm = [self._gen_perm(rng) for _ in range(3)]

    def _gen_perm(self, rng):
        arr = np.arange(self.POINT_COUNT)
        for i in range(self.POINT_COUNT - 1, 0, -1):  # permute(), :221-228
            target = int(rng.uniform(0.0, i))
            arr[i], arr[target] = arr[target], arr[i]
        return arr

    def noise(self, p):
        pf = np.floor(p)
        u, v, w = (p - pf).T
        uu1 = u * u * (3 - 2 * u)   # smoothed once in noise() (:177-181)
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


def main():
    import jax.numpy as jnp
    from mort_tpu.io.image import _save_png_pure
    from mort_tpu.render.textures import _turbulence, noise_salt

    W = H = 256
    scale = 4.0
    xs, zs = np.meshgrid(np.linspace(0, 4, W), np.linspace(0, 4, H))
    p = np.stack([xs.ravel(), np.zeros(W * H), zs.ravel()], axis=1).astype(np.float32)

    s = scale * p
    ours = np.asarray(
        0.5 * (1.0 + jnp.sin(s[:, 2] + 10.0 * _turbulence(jnp.asarray(s),
                                                          noise_salt(0)))))
    ref = RefPerlin().marble(p.astype(np.float64), scale)

    def strip(vals):
        g = np.sqrt(np.clip(vals, 0, 1)).reshape(H, W)
        return np.repeat((256.0 * np.clip(g, 0, 0.999))
                         .astype(np.uint8)[..., None], 3, axis=-1)

    gap = np.full((H, 8, 3), 32, np.uint8)
    side = np.concatenate([strip(ours), gap, strip(ref)], axis=1)
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "perlin_comparison.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    _save_png_pure(out, side)
    print("wrote", os.path.abspath(out),
          f"(left: hash-lattice, right: perm-table; means "
          f"{ours.mean():.3f} / {ref.mean():.3f}, "
          f"stds {ours.std():.3f} / {ref.std():.3f})")


if __name__ == "__main__":
    main()
