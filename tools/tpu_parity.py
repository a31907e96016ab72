"""TPU image validation: the production render path (wavefront + Pallas
kernel + default accel) on the REAL chip must draw the same picture as the
CPU/XLA reference path that the golden/oracle suites pin.

The reference's imgs/ screenshots are its informal fixtures (SURVEY.md
section 4); this is the formal analogue for the TPU fast path: scenes
1/4/6/8 are rendered small-crop on the TPU with exactly the code the
benchmarks time (scene 8 resolves accel="bvh", exercising the packet heap
traversal), compared against a freshly computed CPU lockstep render of the
same config, and the verdict is written to TPU_PARITY.json at the repo root.

    python tools/tpu_parity.py            # on the TPU host

The CPU reference images are produced by re-exec'ing this script with
JAX_PLATFORMS=cpu (one process cannot serve both backends here), cached in
/tmp between runs.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCENES = (1, 4, 6, 8)
WIDTH = 120
SPP = 16          # counter RNG => identical per-sample paths on every backend
DEPTH = 10
SEED = 69420
CACHE = "/tmp/mort_tpu_parity_ref.npz"

# agreement thresholds (conftest.assert_images_close semantics): float32
# non-associativity + TPU transcendental rounding flips a handful of
# chaotic paths; the bulk must agree tightly
FRAC_OK = 0.97
ATOL = 2e-2
MEAN_TOL = 4e-3


def _cam_for(cam):
    h = max(1, int(WIDTH * cam.image_height / cam.image_width))
    import numpy as np
    return cam.replace(image_width=WIDTH, image_height=h,
                       sqrt_spp=int(np.sqrt(SPP)), bounce_limit=DEPTH)


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
    for idx in SCENES:
        world, cam = sc.build_scene(idx)
        data, meta = world.compile()
        img = np.asarray(render(data, meta, _cam_for(cam), seed=SEED))
        out[str(idx)] = img
        print(f"  cpu ref scene {idx}: {img.shape}", file=sys.stderr)
    np.savez(CACHE, **out)


def main():
    import numpy as np

    if "--cpu-refs" in sys.argv:
        render_cpu_refs()
        return

    if not os.path.exists(CACHE):
        print("computing CPU reference images (subprocess)...",
              file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--cpu-refs"], check=True, env=env)
    refs = np.load(CACHE)

    import jax
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    backend = jax.default_backend()
    results = []
    ok_all = True
    for idx in SCENES:
        world, cam = sc.build_scene(idx)
        data, meta = world.compile()
        cam = _cam_for(cam)
        img = np.asarray(render_wavefront(data, meta, cam, seed=SEED,
                                          use_pallas=(backend == "tpu")))
        want = refs[str(idx)]
        diff = np.abs(img - want)
        frac = float(np.mean(np.all(diff <= ATOL, axis=-1)))
        mean = float(diff.mean())
        n_prims = meta.n_spheres + meta.n_quads
        accel = "bvh" if n_prims > 512 else "none"
        ok = frac >= FRAC_OK and mean <= MEAN_TOL
        ok_all &= ok
        results.append({
            "scene": idx, "width": cam.image_width,
            "height": cam.image_height, "spp": SPP, "depth": DEPTH,
            "accel": accel, "n_prims": int(n_prims),
            "frac_within_atol": round(frac, 4), "mean_abs": round(mean, 6),
            "max_abs": round(float(diff.max()), 4), "ok": bool(ok),
        })
        print(f"  scene {idx} ({accel}, {n_prims} prims): "
              f"frac={frac:.4f} mean={mean:.5f} -> "
              f"{'OK' if ok else 'FAIL'}", file=sys.stderr)

    artifact = {
        "backend": backend,
        "config": {"width": WIDTH, "spp": SPP, "depth": DEPTH, "seed": SEED,
                   "frac_ok": FRAC_OK, "atol": ATOL, "mean_tol": MEAN_TOL},
        "comparison": "wavefront+pallas(default accel) on this backend vs "
                      "CPU lockstep XLA render, identical counter-RNG "
                      "samples",
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
