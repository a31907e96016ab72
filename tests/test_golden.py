"""Golden-image regression fixtures (SURVEY.md section 4): the sha256 of the
u8 render of every scene at a pinned config, the reference's imgs/
screenshots made machine-checkable.  Any silent image drift — in RNG layout,
scene constants, shading, or the integrator — fails here.

Regenerate (after an INTENDED image change) with:  python tools/gen_golden.py
"""

import hashlib
import json
import os

import numpy as np
import pytest

from mort_tpu.render.renderer import render, to_u8_np
from mort_tpu.render.wavefront import render_wavefront
from mort_tpu.scene import scenes as sc

GOLDEN_WIDTH = 48
GOLDEN_SPP = 4
GOLDEN_DEPTH = 8
GOLDEN_SEED = 69420

with open(os.path.join(os.path.dirname(__file__), "golden_hashes.json")) as f:
    GOLDEN = json.load(f)


def _golden_camera(cam):
    h = max(1, int(GOLDEN_WIDTH * cam.image_height / cam.image_width))
    return cam.replace(image_width=GOLDEN_WIDTH, image_height=h,
                       sqrt_spp=int(np.sqrt(GOLDEN_SPP)),
                       bounce_limit=GOLDEN_DEPTH)


@pytest.mark.parametrize("idx", list(range(1, 11)))
def test_golden_scene(idx):
    world, cam = sc.build_scene(idx)
    data, meta = world.compile()
    img = to_u8_np(render(data, meta, _golden_camera(cam), seed=GOLDEN_SEED))
    got = hashlib.sha256(img.tobytes()).hexdigest()
    assert got == GOLDEN[str(idx)], (
        f"scene {idx} image drifted (sha256 {got[:16]}… != "
        f"{GOLDEN[str(idx)][:16]}…); if intended, regenerate with "
        f"tools/gen_golden.py")


def test_golden_wavefront_agrees_scene2():
    """The wavefront path must land within one u8 step of the pinned
    lockstep image (identical samples, different accumulation order)."""
    world, cam = sc.two_spheres()
    data, meta = world.compile()
    cam = _golden_camera(cam)
    a = to_u8_np(render(data, meta, cam, seed=GOLDEN_SEED)).astype(np.int16)
    b = to_u8_np(render_wavefront(data, meta, cam, seed=GOLDEN_SEED)).astype(np.int16)
    assert np.abs(a - b).max() <= 1
