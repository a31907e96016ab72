"""Unit tests for scene compilation, BVH build, textures, determinism."""

import numpy as np

from mort_tpu import World, make_camera
from mort_tpu.render.renderer import render, to_u8_np
from mort_tpu.scene import scenes as sc
from mort_tpu.scene.bvh import build_bvh_numpy
from mort_tpu.scene.types import OBJ_SPHERE


def test_transform_baking_rotate_translate():
    """rotate_y(90) then translate of a sphere lands where the reference's
    ray-space transforms would put it (objects.cuh:268-278, 335-366)."""
    w = World()
    m = w.lambertian(w.solid_color([1, 0, 0]))
    s = w.sphere([1, 0, 0], 0.5, m, skip=True)
    lst = w.hittable_list([s], skip=True)
    rot = w.rotate_y(lst, 90, skip=True)
    w.translate(rot, [10, 0, 0])
    data, meta = w.compile()
    assert meta.n_spheres == 1
    # R_y(90): (x,z) -> (z? ...): world_from_object maps (1,0,0) -> (0,0,-1)
    np.testing.assert_allclose(np.asarray(data.sph_center[0]),
                               [10, 0, -1], atol=1e-5)


def test_skip_and_list_reachability():
    """Skip-flagged prims are hittable only through non-skip lists
    (world.cuh:105-171 reachability)."""
    w = World()
    m = w.lambertian(w.solid_color([1, 1, 1]))
    w.sphere([0, 0, 0], 1, m, skip=True)        # unreachable
    s2 = w.sphere([5, 0, 0], 1, m, skip=True)   # reachable via list
    w.hittable_list([s2], skip=False)
    data, meta = w.compile()
    assert meta.n_spheres == 1
    np.testing.assert_allclose(np.asarray(data.sph_center[0]), [5, 0, 0])


def test_bvh_mode_restricts_to_bvh():
    """bvh_mode: only BVH contents are hittable (world.cuh:118-120)."""
    w = World()
    m = w.lambertian(w.solid_color([1, 1, 1]))
    w.sphere([9, 9, 9], 1, m)                   # non-skip but ignored
    s = w.sphere([0, 0, 0], 1, m, skip=True)
    lst = w.hittable_list([s], skip=True)
    w.bvh(lst)
    data, meta = w.compile()
    assert meta.use_bvh and meta.n_spheres == 1


def test_bvh_build_topology():
    rng = np.random.RandomState(0)
    n = 37
    centers = rng.randn(n, 3).astype(np.float32) * 10
    radii = np.full(n, 0.5, np.float32)
    cvecs = np.zeros((n, 3), np.float32)
    qq = qu = qv = np.zeros((1, 3), np.float32)
    leaves = [(OBJ_SPHERE, i) for i in range(n)]
    nmin, nmax, left, right, lk, rk, is_leaf = build_bvh_numpy(
        leaves, centers, radii, cvecs, qq, qu, qv)
    # root box contains everything
    np.testing.assert_array_less(nmin[0] - 1e-4, centers.min(0) - 0.5 + 1e-3)
    assert (nmax[0] >= centers.max(0) + 0.5 - 1e-3).all()
    # every leaf payload is a valid sphere row; internal children valid nodes
    n_nodes = len(left)
    leaf_rows = set()
    for i in range(n_nodes):
        if is_leaf[i]:
            leaf_rows.add(int(left[i]))
            leaf_rows.add(int(right[i]))
        else:
            assert 0 < left[i] < n_nodes and 0 < right[i] < n_nodes
            # child boxes inside parent box
            for ch in (left[i], right[i]):
                assert (nmin[ch] >= nmin[i] - 1e-4).all()
                assert (nmax[ch] <= nmax[i] + 1e-4).all()
    assert leaf_rows == set(range(n))  # all primitives reachable exactly


def test_render_deterministic(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    a = np.asarray(render(data, meta, cam, seed=7))
    b = np.asarray(render(data, meta, cam, seed=7))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(data, meta, cam, seed=8))
    assert np.abs(a - c).max() > 1e-4  # seed changes the image


def test_while_and_fori_integrators_agree(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    a = np.asarray(render(data, meta, cam, differentiable=False))
    b = np.asarray(render(data, meta, cam, differentiable=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_u8_pipeline_matches_reference_semantics():
    img = np.array([[[0.0, 0.25, 1.5]]], np.float32)
    u8 = to_u8_np(img)
    # sqrt -> clamp 0.999 -> *256 int cast (camera.cuh:200-207)
    assert u8[0, 0, 0] == 0
    assert u8[0, 0, 1] == int(256 * 0.5)
    assert u8[0, 0, 2] == int(256 * 0.999)


def test_stratification_reduces_variance():
    """sqrt_spp stratification (camera.cuh:51-53, 236-242) should beat
    independent sampling noise: variance across seeds must be modest."""
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    w.sphere([0, 0, -2], 1.0, m)
    data, meta = w.compile()
    cam = make_camera(image_width=8, aspect_ratio=1.0, samples_per_pixel=16,
                      bounce_limit=3, vfov=60, lookfrom=[0, 0, 1],
                      lookat=[0, 0, -2])
    imgs = [np.asarray(render(data, meta, cam, seed=s)) for s in range(3)]
    spread = np.stack(imgs).std(0).mean()
    assert spread < 0.03


def test_media_count_capped_at_compile():
    """The packed RNG slot layout serves at most rng.MAX_MEDIA constant
    media (medium m reads word m of one philox block); a scene exceeding
    it must fail loudly at compile, not deep inside media_pass."""
    import pytest
    from mort_tpu import World
    from mort_tpu.rng import MAX_MEDIA

    w = World()
    iso = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(MAX_MEDIA + 1):
        b = w.sphere([3.0 * i, 0, 0], 1.0, w.dielectric(1.5), skip=True)
        w.constant_medium(b, 0.2, iso)
    with pytest.raises(ValueError, match="constant media"):
        w.compile()


def test_float_image_texture_not_quantized():
    """u8-sourced images ride the packed-u32 gather (bit-exact round trip);
    a float image that is NOT u8-representable must keep full precision
    via the f32 gather fallback instead of being silently quantized
    (SceneMeta.images_u8_exact)."""
    import numpy as np
    import jax.numpy as jnp
    from mort_tpu import World
    from mort_tpu.render.textures import texture_value

    val = np.float32(0.123456)           # not representable as k/255
    img = np.full((4, 4, 3), val, np.float32)
    w = World()
    tex = w.image_texture(img)
    w.sphere([0, 0, 0], 1.0, w.lambertian(tex))
    data, meta = w.compile()
    assert meta.images_u8_exact == (False,)

    u = jnp.full((8,), 0.5); v = jnp.full((8,), 0.5)
    p = jnp.zeros((8, 3))
    out = np.asarray(texture_value(data, meta, jnp.full((8,), tex.row,
                                                        jnp.int32), u, v, p))
    np.testing.assert_array_equal(out, val)

    # and a u8-sourced image still round-trips exactly through the packed path
    img8 = (np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5)
    w2 = World()
    tex2 = w2.image_texture(img8)
    w2.sphere([0, 0, 0], 1.0, w2.lambertian(tex2))
    d2, m2 = w2.compile()
    assert m2.images_u8_exact == (True,)
    out2 = np.asarray(texture_value(d2, m2, jnp.full((8,), tex2.row,
                                                     jnp.int32), u, v, p))
    assert np.isfinite(out2).all()
