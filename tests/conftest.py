"""Test configuration: 8-device virtual CPU mesh (SURVEY.md section 4).

Must run before any jax import: forces the CPU backend with 8 virtual
devices so multi-chip sharding tests run without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# A pytest plugin (jaxtyping) imports jax before this conftest runs, so the
# JAX_PLATFORMS env var above is read too late; force the platform through
# the config (backends are not initialised until first use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mort_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def three_sphere_scene():
    """Small scene covering lambertian/metal/dielectric + checker ground."""
    from mort_tpu import World, make_camera

    w = World()
    c1 = w.solid_color([0.2, 0.3, 0.1])
    c2 = w.solid_color([0.9, 0.9, 0.9])
    ground = w.lambertian(w.checker(0.32, c1, c2))
    center = w.lambertian(w.solid_color([0.1, 0.2, 0.5]))
    left = w.dielectric(1.5)
    right = w.metal([0.8, 0.6, 0.2], 0.1)
    w.sphere([0, -100.5, -1], 100, ground)
    w.sphere([0, 0, -1], 0.5, center)
    w.sphere([-1, 0, -1], 0.5, left)
    w.sphere([1, 0, -1], 0.5, right)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=16 / 9, image_width=32, samples_per_pixel=4,
                      bounce_limit=8, vfov=20, lookfrom=[-2, 2, 1],
                      lookat=[0, 0, -1], defocus_angle=10.0, focus_dist=3.4)
    return data, meta, cam


def assert_images_close(got, want, frac_ok=0.98, atol=2e-2, mean_tol=4e-3, msg=""):
    """Tolerant image comparison: path tracing is chaotic in float32, so a
    small fraction of pixels may take divergent branches between two
    correct implementations; the bulk must agree tightly."""
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    frac = np.mean(np.all(diff <= atol, axis=-1))
    mean = diff.mean()
    assert frac >= frac_ok and mean <= mean_tol, (
        f"{msg} images differ: frac_within={frac:.4f} (need {frac_ok}), "
        f"mean_abs={mean:.5f} (need {mean_tol}); max={diff.max():.4f}")
