"""Regenerate tests/golden_hashes.json: sha256 of the u8 render of each
scene at the pinned regression config (the reference's imgs/ analogue,
SURVEY.md section 4).  Run on the CPU backend:

    python tools/gen_golden.py
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_WIDTH = 48
GOLDEN_SPP = 4
GOLDEN_DEPTH = 8
GOLDEN_SEED = 69420


def golden_camera(cam):
    h = max(1, int(GOLDEN_WIDTH * cam.image_height / cam.image_width))
    return cam.replace(image_width=GOLDEN_WIDTH, image_height=h,
                       sqrt_spp=int(np.sqrt(GOLDEN_SPP)),
                       bounce_limit=GOLDEN_DEPTH)


def scene_hash(idx):
    from mort_tpu.render.renderer import render, to_u8_np
    from mort_tpu.scene import scenes as sc

    world, cam = sc.build_scene(idx)
    data, meta = world.compile()
    img = to_u8_np(render(data, meta, golden_camera(cam), seed=GOLDEN_SEED))
    return hashlib.sha256(img.tobytes()).hexdigest(), img


def main():
    out = {}
    for idx in range(1, 11):
        t0 = time.perf_counter()
        h, img = scene_hash(idx)
        out[str(idx)] = h
        print(f"scene {idx}: {h[:16]}…  {img.shape}  "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_hashes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
