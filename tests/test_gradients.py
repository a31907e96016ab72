"""Pixel-gradient verification: forward-mode autodiff vs finite differences.

BASELINE target: pixel gradients w.r.t. sphere centers/radii, material
albedo/fuzz/IOR, and camera parameters allclose to finite differences.

Methodology: ``jax.jvp`` gives the derivative of EVERY pixel w.r.t. a scalar
parameter in one forward pass; central differences at two step sizes give a
reference.  A fixed-sample path-tracing estimator is piecewise smooth — a
small fraction of pixels sit on discrete-decision boundaries (shadow-acne
flips, reflect/refract branch flips, silhouette crossings) where FD measures
the jump, not the local slope.  Pixels where the two FD step sizes disagree
are excluded (flip-contaminated); on the stable majority, autodiff must
match FD tightly.  Autodiff computes the *interior* derivative; silhouette
boundary terms are a separate (reparameterisation) feature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mort_tpu import World, make_camera
from mort_tpu.render.renderer import render


def _img_fn(data, meta, cam, apply):
    def f(eps):
        d, c = apply(data, cam, eps)
        return render(d, meta, c, differentiable=True).sum(-1)  # [H,W] luma-ish
    return f


def _check_pixel_grads(data, meta, cam, apply, name,
                       e1=1e-3, min_stable=0.5, rtol=0.15, atol=2e-3,
                       frac_ok=0.93, require_signal=1e-3):
    f = _img_fn(data, meta, cam, apply)
    _, d_auto = jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))
    d_auto = np.asarray(d_auto)
    assert np.isfinite(d_auto).all(), f"{name}: non-finite autodiff"

    e2 = e1 / 3.0
    fd1 = (np.asarray(f(jnp.float32(e1))) - np.asarray(f(jnp.float32(-e1)))) / (2 * e1)
    fd2 = (np.asarray(f(jnp.float32(e2))) - np.asarray(f(jnp.float32(-e2)))) / (2 * e2)

    stable = np.abs(fd1 - fd2) <= 0.07 * np.maximum(np.abs(fd1), np.abs(fd2)) + 1e-3
    frac_stable = stable.mean()
    assert frac_stable >= min_stable, (
        f"{name}: only {frac_stable:.2f} of pixels FD-stable")

    err = np.abs(d_auto - fd2)
    ok = err <= rtol * np.abs(fd2) + atol
    frac = ok[stable].mean()
    assert frac >= frac_ok, (
        f"{name}: {frac:.3f} of stable pixels match "
        f"(worst err {err[stable].max():.4f}, "
        f"auto rms {np.sqrt((d_auto[stable]**2).mean()):.4f})")
    assert np.abs(d_auto[stable]).max() >= require_signal, (
        f"{name}: gradient signal too small to be meaningful")


def _noise_sphere_scene():
    """Perlin-marble sphere: smooth 3-D texture => real interior derivative
    for geometry/camera parameters (checker/image are piecewise constant)."""
    w = World()
    mat = w.lambertian(w.noise_texture(0.4))
    w.sphere([0, 0, -2], 1.2, mat)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=20, samples_per_pixel=9,
                      bounce_limit=3, vfov=40, lookfrom=[0, 0, 1],
                      lookat=[0, 0, -2])
    return data, meta, cam


def test_sphere_center_pixel_grads():
    data, meta, cam = _noise_sphere_scene()
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(sph_center=d.sph_center.at[0, 0].add(e)), c),
        "sphere center.x")


def test_sphere_radius_pixel_grads():
    data, meta, cam = _noise_sphere_scene()
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(sph_radius=d.sph_radius.at[0].add(e)), c),
        "sphere radius")


def test_albedo_pixel_grads():
    w = World()
    c1 = w.solid_color([0.9, 0.1, 0.1])
    c2 = w.solid_color([0.1, 0.1, 0.9])
    mat = w.lambertian(w.checker(0.25, c1, c2))
    w.sphere([0, 0, -2], 1.2, mat)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=20, samples_per_pixel=4,
                      bounce_limit=3, vfov=40, lookfrom=[0, 0, 1],
                      lookat=[0, 0, -2])
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(tex_color=d.tex_color.at[0, 0].add(e)), c),
        "albedo.r", e1=1e-2, min_stable=0.9, frac_ok=0.98)


def test_camera_vfov_pixel_grads():
    data, meta, cam = _noise_sphere_scene()
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d, c.replace(vfov=c.vfov + e)),
        "camera vfov", e1=3e-3)


def test_camera_lookfrom_pixel_grads():
    data, meta, cam = _noise_sphere_scene()
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d, c.replace(lookfrom=c.lookfrom + jnp.array([e, 0., 0.]))),
        "camera lookfrom.x")


def test_metal_albedo_pixel_grads():
    w = World()
    ground = w.lambertian(w.noise_texture(0.4))
    metal = w.metal([0.8, 0.7, 0.6], 0.0)
    w.quad([-4, -0.5, -6], [8, 0, 0], [0, 0, 8], ground)
    w.sphere([0, 0.7, -3], 1.0, metal)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=20, samples_per_pixel=9,
                      bounce_limit=3, vfov=35, lookfrom=[0, 0.7, 0],
                      lookat=[0, 0.7, -3])
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(mat_albedo=d.mat_albedo.at[1, 1].add(e)), c),
        "metal albedo.g", e1=1e-2, min_stable=0.8, frac_ok=0.95)


def test_dielectric_ior_pixel_grads():
    w = World()
    ground = w.lambertian(w.noise_texture(0.4))
    glass = w.dielectric(1.5)
    w.quad([-6, -1.2, -8], [12, 0, 0], [0, 0, 12], ground)
    w.sphere([0, 0, -3], 1.0, glass)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=20, samples_per_pixel=9,
                      bounce_limit=5, vfov=35, lookfrom=[0, 0.2, 0],
                      lookat=[0, 0, -3])
    # refract/reflect branch flips under eps -> fewer stable pixels expected
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(mat_ior=d.mat_ior.at[1].add(e)), c),
        "dielectric ior", e1=2e-3, min_stable=0.4, frac_ok=0.9)


def test_emission_pixel_grads():
    w = World()
    white = w.lambertian(w.solid_color([0.73, 0.73, 0.73]))
    lamp = w.diffuse_light(w.solid_color([5.0, 5.0, 5.0]))
    w.quad([-2, 1.9, -4], [4, 0, 0], [0, 0, 2], lamp)
    w.quad([-4, -1, -6], [8, 0, 0], [0, 0, 6], white)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=16, samples_per_pixel=9,
                      bounce_limit=3, vfov=60, lookfrom=[0, 0.5, 0],
                      lookat=[0, 0, -3], background=[0, 0, 0])
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(tex_color=d.tex_color.at[1].add(e)), c),
        "lamp emission", e1=1e-2, min_stable=0.8, frac_ok=0.95)


def test_fuzz_pixel_grads():
    """Metal fuzz: the fuzz magnitude scales an RNG offset vector smoothly."""
    w = World()
    ground = w.lambertian(w.noise_texture(0.4))
    metal = w.metal([0.9, 0.8, 0.7], 0.2)
    w.quad([-4, -0.5, -6], [8, 0, 0], [0, 0, 8], ground)
    w.sphere([0, 0.7, -3], 1.0, metal)
    data, meta = w.compile()
    cam = make_camera(aspect_ratio=1.0, image_width=16, samples_per_pixel=9,
                      bounce_limit=3, vfov=35, lookfrom=[0, 0.7, 0],
                      lookat=[0, 0.7, -3])
    _check_pixel_grads(
        data, meta, cam,
        lambda d, c, e: (d.replace(mat_fuzz=d.mat_fuzz.at[1].add(e)), c),
        "metal fuzz", e1=2e-3, min_stable=0.4, frac_ok=0.9)
