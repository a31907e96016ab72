"""TPU image validation: the production render path (wavefront + Pallas
kernel + default accel) on the REAL chip must draw the same picture as the
CPU/XLA reference path that the golden/oracle suites pin.

Methodology.  Per-sample bit-parity across backends is impossible by
design: TPU fuses multiply-adds differently than CPU (camera ray
directions differ ~1e-6 relative) and transcendental implementations
differ in ulps, and a path tracer is chaotic — a 1e-6 direction
perturbation decorrelates individual sample paths within a few bounces
(measured: first-bounce perlin attenuation flips full-scale).  The honest
cross-backend statement is therefore statistical, exactly like validating
two renderers of the same integral:

* noise-floor test: mean|TPU(seed A) - CPU(seed A)| must not exceed
  mean|TPU(seed A) - TPU(seed B)| (pure Monte-Carlo noise at the same
  spp) by more than NOISE_FACTOR — i.e. the CPU image is as close to the
  TPU image as an independent sample of the TPU image itself;
* bias test: the per-channel image means (one number per channel,
  averaging ~W*H*spp samples, so MC noise is negligible) must agree to
  MEAN_RTOL relative.

A real defect (wrong geometry, wrong shading, wrong RNG) fails both.
The reference's imgs/ screenshots are its informal fixtures (SURVEY.md
section 4); TPU_PARITY.json is the formal analogue for the TPU fast path:
ALL TEN scenes rendered with exactly the code the benchmarks time
(scene 8 exercises the slab/aaq fast path at its production accel), plus
a depth-50 row (the reference's deep-bounce regime) and forced
"bvh"/"cull" rows so every kernel accel path is chip-validated.

    python tools/tpu_parity.py            # on the TPU host

The CPU reference images are produced by re-exec'ing this script with the
CPU backend forced (one process cannot serve both backends), cached in
/tmp between runs.
"""

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WIDTH = 120
SPP = 16
DEPTH = 10
SEED_A = 69420
SEED_B = 1337

# The r05 gate: ALL TEN reference scenes at the standard config, plus a
# depth-50 row (the bounce-depth regime the reference's heavy scenes run,
# mort.cu:436/492 — deep-bounce accumulation) and forced-accel rows so the
# limb-packed MXU dot is chip-validated under the "cull" and "bvh" paths
# too (the auto policy routes every reference scene through "none").
CONFIGS = (
    [{"scene": i, "depth": DEPTH, "accel": None} for i in range(1, 11)]
    + [{"scene": 6, "depth": 50, "accel": None},
       {"scene": 1, "depth": DEPTH, "accel": "bvh"},
       {"scene": 1, "depth": DEPTH, "accel": "cull"}]
)


def _cfg_label(cfg):
    lab = str(cfg["scene"])
    if cfg["depth"] != DEPTH:
        lab += f"@d{cfg['depth']}"
    if cfg["accel"]:
        lab += f"@{cfg['accel']}"
    return lab


def _ref_key(cfg):
    # the CPU reference depends on scene+depth only (accel is a TPU-side
    # kernel mode; the CPU lockstep reference is accel-independent)
    return f"{cfg['scene']}@d{cfg['depth']}"


def _cache_path():
    """CPU-reference cache keyed by a digest of the source tree + config, so
    a stale cache from an older code state can never corrupt the comparison."""
    root = os.path.join(os.path.dirname(__file__), "..", "mort_tpu")
    h = hashlib.sha256()
    keys = tuple(sorted({_ref_key(c) for c in CONFIGS}))
    h.update(repr((keys, WIDTH, SPP, SEED_A)).encode())
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(fn.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return f"/tmp/mort_tpu_parity_ref_{h.hexdigest()[:16]}.npz"


CACHE = _cache_path()

NOISE_FACTOR = 1.3    # cross-backend diff <= 1.3x the same-spp MC noise
NOISE_ABS = 0.01      # ... plus this absolute slack
MEAN_RTOL = 0.02      # per-channel image-mean agreement
MEAN_ATOL = 0.005


def _cam_for(cam, depth=DEPTH):
    h = max(1, int(WIDTH * cam.image_height / cam.image_width))
    import numpy as np
    return cam.replace(image_width=WIDTH, image_height=h,
                       sqrt_spp=int(np.sqrt(SPP)), bounce_limit=depth)


def render_cpu_refs():
    # JAX_PLATFORMS=cpu in the env is NOT enough here: the axon
    # sitecustomize registers the tunneled-TPU backend at interpreter start
    # and wins anyway; only the config route actually forces CPU.
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    import numpy as np
    from mort_tpu.render.renderer import render
    from mort_tpu.scene import scenes as sc

    out = {}
    for key in sorted({_ref_key(c) for c in CONFIGS}):
        idx, depth = key.split("@d")
        world, cam = sc.build_scene(int(idx))
        data, meta = world.compile()
        img = np.asarray(render(data, meta, _cam_for(cam, int(depth)),
                                seed=SEED_A))
        out[key] = img
        print(f"  cpu ref {key}: {img.shape}", file=sys.stderr)
    np.savez(CACHE, **out)


def main():
    import numpy as np

    if "--cpu-refs" in sys.argv:
        render_cpu_refs()
        return

    if not os.path.exists(CACHE):
        print("computing CPU reference images (subprocess)...",
              file=sys.stderr)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--cpu-refs"], check=True)
    refs = np.load(CACHE)

    import jax
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    backend = jax.default_backend()
    results = []
    ok_all = True
    for cfg in CONFIGS:
        idx = cfg["scene"]
        world, cam = sc.build_scene(idx)
        data, meta = world.compile()
        cam = _cam_for(cam, cfg["depth"])
        kw = dict(use_pallas=(backend == "tpu"),
                  pallas_accel=cfg["accel"])
        img_a = np.asarray(render_wavefront(data, meta, cam, seed=SEED_A,
                                            **kw))
        img_b = np.asarray(render_wavefront(data, meta, cam, seed=SEED_B,
                                            **kw))
        want = refs[_ref_key(cfg)]

        cross = float(np.abs(img_a - want).mean())
        noise = float(np.abs(img_a - img_b).mean())
        mean_tpu = img_a.mean(axis=(0, 1))
        mean_cpu = want.mean(axis=(0, 1))
        mean_err = float(np.max(np.abs(mean_tpu - mean_cpu)
                                / np.maximum(np.abs(mean_cpu), MEAN_ATOL)))
        from mort_tpu.render.pallas_intersect import auto_accel
        n_prims = meta.n_spheres + meta.n_quads
        accel = cfg["accel"] or auto_accel(n_prims)
        ok_noise = cross <= NOISE_FACTOR * noise + NOISE_ABS
        ok_mean = mean_err <= MEAN_RTOL
        ok = bool(ok_noise and ok_mean
                  and np.isfinite(img_a).all() and np.isfinite(img_b).all())
        ok_all &= ok
        results.append({
            "scene": idx, "label": _cfg_label(cfg),
            "width": cam.image_width,
            "height": cam.image_height, "spp": SPP, "depth": cfg["depth"],
            "accel": accel, "forced_accel": bool(cfg["accel"]),
            "n_prims": int(n_prims),
            "cross_backend_mean_abs": round(cross, 5),
            "mc_noise_mean_abs": round(noise, 5),
            "cross_over_noise": round(cross / max(noise, 1e-9), 3),
            "channel_mean_rel_err": round(mean_err, 5),
            "ok_noise": bool(ok_noise), "ok_mean": bool(ok_mean),
            "ok": ok,
        })
        print(f"  scene {_cfg_label(cfg)} ({accel}, {n_prims} prims): "
              f"cross={cross:.4f} noise={noise:.4f} "
              f"ratio={cross/max(noise,1e-9):.2f} "
              f"mean_rel={mean_err:.4f} -> {'OK' if ok else 'FAIL'}",
              file=sys.stderr)

    artifact = {
        "backend": backend,
        "config": {"width": WIDTH, "spp": SPP, "base_depth": DEPTH,
                   "n_configs": len(CONFIGS),
                   "seeds": [SEED_A, SEED_B],
                   "noise_factor": NOISE_FACTOR, "noise_abs": NOISE_ABS,
                   "mean_rtol": MEAN_RTOL},
        "comparison": "wavefront+pallas(default accel) on this backend vs "
                      "CPU lockstep XLA render; cross-backend mean abs "
                      "diff gated by the same-spp MC noise floor "
                      "(TPU seed A vs seed B) + image-mean bias check "
                      "(see module docstring for why per-sample parity "
                      "cannot hold across FPUs)",
        "scenes": results,
        "ok": bool(ok_all),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "TPU_PARITY.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {os.path.abspath(path)} ok={ok_all}")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
