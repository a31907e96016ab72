"""Forward-render parity: wavefront TPU renderer vs scalar CPU oracle.

The BASELINE prescribes allclose-vs-CPU-reference on scenes 1-10 at low spp
with matched RNG.  The oracle (tests/oracle.py) mirrors the reference
recursion scalar-by-scalar; these tests render small crops of each scene
with both implementations and compare.
"""

import numpy as np
import pytest

from conftest import assert_images_close
from oracle import Oracle

from mort_tpu.render.renderer import render
from mort_tpu.scene import scenes as sc


def _small(cam, width, spp, depth):
    return cam.replace(
        image_width=width,
        image_height=max(1, int(width * cam.image_height / cam.image_width)),
        sqrt_spp=max(1, int(np.sqrt(spp))),
        bounce_limit=depth,
    )


def _compare(world, cam, width=24, spp=4, depth=6, **tol):
    data, meta = world.compile()
    cam = _small(cam, width, spp, depth)
    got = np.asarray(render(data, meta, cam))
    want = Oracle(data, meta, cam).render()
    assert_images_close(got, want, **tol)


def test_three_sphere(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    got = np.asarray(render(data, meta, cam))
    want = Oracle(data, meta, cam).render()
    assert_images_close(got, want, msg="three_sphere")


@pytest.mark.parametrize("idx", [2, 3, 5, 10])
def test_simple_scenes(idx):
    world, cam = sc.build_scene(idx)
    _compare(world, cam, msg=f"scene{idx}")


def test_scene1_quick():
    world, cam = sc.random_spheres(quick=True)
    _compare(world, cam, width=24, spp=4, depth=6)


def test_scene4_perlin():
    world, cam = sc.two_perlin_spheres()
    _compare(world, cam, width=16, spp=4, depth=4)


def test_scene6_cornell():
    world, cam = sc.cornell_box()
    # MIS + dielectric light sampling; a 128-px cross-integrator comparison
    # complements this oracle crop (test_wavefront.test_cornell_mediumres)
    _compare(world, cam, width=32, spp=9, depth=6, frac_ok=0.97,
             mean_tol=1.5e-2)


def test_scene7_smoke():
    world, cam = sc.cornell_smoke()
    _compare(world, cam, width=16, spp=9, depth=6, frac_ok=0.93, mean_tol=3e-2)


def test_scene9_final_quick():
    world, cam = sc.final_scene(24, 4, 4, quick=True)
    _compare(world, cam, width=24, spp=4, depth=4, frac_ok=0.9, mean_tol=5e-2)
