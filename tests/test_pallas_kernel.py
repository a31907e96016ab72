"""Pallas closest-hit kernel parity vs the XLA intersector (interpret mode).

The fused kernel (render/pallas_intersect.py) must agree with
intersect.intersect_best on (t, kind, idx) and produce joined rows matching
primtable.build_prim_table — across sphere-only, quad-only, and mixed
scenes, including motion blur.  Runs in pl.pallas_call(interpret=True) so it
executes on the CPU test backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mort_tpu import World, make_camera
from mort_tpu.render import pallas_intersect as pal
from mort_tpu.render.intersect import (
    K_QUAD, K_SPHERE, T_MIN, intersect_best, quad_frames,
)
from mort_tpu.render.primtable import build_prim_table


def _rand_rays(n, seed=0, spread=6.0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(rng.randn(n, 3) * spread, jnp.float32)
    rd = jnp.asarray(rng.randn(n, 3), jnp.float32)
    tme = jnp.asarray(rng.rand(n), jnp.float32)
    return ro, rd, tme


def _mixed_world(n_sph=7, n_quad=5, moving=False):
    rng = np.random.RandomState(1)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(n_sph):
        c = rng.randn(3) * 3
        if moving and i % 2 == 0:
            w.sphere(c, 0.3 + rng.rand(), m, center2=c + rng.randn(3) * 0.5)
        else:
            w.sphere(c, 0.3 + rng.rand(), m)
    for _ in range(n_quad):
        w.quad(rng.randn(3) * 3, rng.randn(3) * 2, rng.randn(3) * 2, m)
    return w


def _check_parity(w, n_rays=256, seed=3, cull=None, accel=None, spread=6.0):
    data, meta = w.compile()
    qf = quad_frames(data)
    table, _ = build_prim_table(data, meta, qf)
    ro, rd, tme = _rand_rays(n_rays, seed, spread)

    bt, bk, bi = intersect_best(data, meta, qf, ro, rd, tme,
                                jnp.uint32(1), jnp.zeros(n_rays, jnp.int32),
                                jnp.zeros(n_rays, jnp.int32), 0)
    pt_, pk, pi, prow = pal.closest_hit_pallas(data, meta, qf, table, ro, rd,
                                               tme, interpret=True, cull=cull,
                                               accel=accel)

    bt_n, bk_n, bi_n = map(np.asarray, (bt, bk, bi))
    pt_n, pk_n, pi_n = map(np.asarray, (pt_, pk, pi))
    hit = np.isfinite(bt_n)
    assert (np.isfinite(pt_n) == hit).all()
    np.testing.assert_allclose(pt_n[hit], bt_n[hit], rtol=3e-5, atol=1e-5)
    assert (pk_n[hit] == bk_n[hit]).all()
    assert (pi_n[hit] == bi_n[hit]).all()

    # joined rows: one-hot matmul gather must equal a direct row gather
    # (kernel emits them transposed, [32, R])
    ns = data.sph_center.shape[0]
    g = np.where(bk_n == K_QUAD, bi_n + ns, bi_n)
    want_rows = np.asarray(table)[np.clip(g, 0, table.shape[0] - 1)]
    got = np.asarray(prow).T[:, :table.shape[1]]
    np.testing.assert_allclose(got[hit], want_rows[hit], rtol=1e-6, atol=1e-6)


def test_mixed_scene_parity():
    _check_parity(_mixed_world())


def test_sphere_only_parity():
    _check_parity(_mixed_world(n_sph=9, n_quad=0))


def test_quad_only_parity():
    _check_parity(_mixed_world(n_sph=0, n_quad=6))


def test_moving_spheres_parity():
    _check_parity(_mixed_world(n_sph=8, n_quad=3, moving=True))


def test_cull_parity_mixed():
    """AABB sub-cluster culling must not change any result."""
    _check_parity(_mixed_world(n_sph=40, n_quad=20), cull=True)


def test_cull_parity_moving():
    _check_parity(_mixed_world(n_sph=30, n_quad=6, moving=True), cull=True)


def test_cull_parity_spread_spheres():
    """Spatially spread spheres (several boxes genuinely culled per tile)."""
    rng = np.random.RandomState(9)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(200):
        c = [i * 5.0 - 500.0, rng.randn() * 2, rng.randn() * 2]
        w.sphere(c, 0.4 + rng.rand(), m)
    _check_parity(w, cull=True)


def test_bvh_parity_forced_small():
    """Packet heap traversal (accel="bvh") forced on a small scene: the tree
    is mostly padding leaves, exercising the inverted-box reachability
    guard."""
    _check_parity(_mixed_world(), accel="bvh")


def test_bvh_parity_large_mixed_moving():
    """660 mixed prims (some moving) under FORCED accel="bvh".  The
    production auto policy routes everything <= BVH_MIN_PRIMS (8192) —
    including scenes 8/9's ~3.4k — through "none"+fast paths; the packet
    heap is the >8192 reserve and must stay parity-green at this scale
    (objects.cuh:664-723 closest-hit incl. tie rules, vs the XLA
    intersector oracle)."""
    w = _mixed_world(n_sph=400, n_quad=260, moving=True)
    data, meta = w.compile()
    assert pal.auto_accel(meta.n_spheres + meta.n_quads) == "none"
    _check_parity(w, accel="bvh")


def test_bvh_parity_spread_spheres():
    """Spatially spread scene where the heap traversal genuinely prunes
    subtrees (rays can't reach most clusters)."""
    rng = np.random.RandomState(9)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(600):
        c = [i * 5.0 - 1500.0, rng.randn() * 2, rng.randn() * 2]
        w.sphere(c, 0.4 + rng.rand(), m)
    _check_parity(w, accel="bvh", spread=30.0)


def test_aaq_fast_path_parity():
    """Axis-aligned quads (box/wall geometry) take the matmul-free VPU fast
    path in accel="none"; mixed with rotated (general-orientation) boxes and
    spheres, closest-hit (t, kind, idx) must match the XLA intersector —
    including registry-order ties between the three candidate routes."""
    rng = np.random.RandomState(2)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for _ in range(8):
        lo = rng.uniform(-8, 6, 3)
        w.box(lo, lo + rng.uniform(1, 3, 3), m)
    w.rotated_box([1, 2, 1], [4, 0, -2], 30, m)     # general path
    w.rotated_box([2, 1, 2], [-5, 0, 3], -20, m)
    for _ in range(6):
        w.sphere(rng.randn(3) * 4, 0.5 + rng.rand(), m)
    data, meta = w.compile()
    n_aaq = sum(1 for c in meta.aaq_class if c != 9)
    n_gen = sum(1 for c in meta.aaq_class if c == 9)
    assert n_aaq >= 48 and n_gen >= 12, (n_aaq, n_gen)
    _check_parity(w, accel="none")


def test_aaq_only_scene_parity():
    """Pure axis-aligned scene (no general quads at all): the compacted
    general table is empty and every quad candidate comes from the VPU
    path."""
    rng = np.random.RandomState(7)
    w = World()
    m = w.lambertian(w.solid_color([0.6, 0.4, 0.3]))
    for _ in range(10):
        lo = rng.uniform(-8, 6, 3)
        w.box(lo, lo + rng.uniform(1, 4, 3), m)
    data, meta = w.compile()
    assert all(c != 9 for c in meta.aaq_class)
    _check_parity(w, accel="none")


def test_aab_detection():
    """box() sextets compile to SceneMeta.aab slab entries; rotated boxes
    (general orientation) and lone quads don't."""
    rng = np.random.RandomState(5)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for _ in range(6):
        lo = rng.uniform(-50, 50, 3)
        w.box(lo, lo + rng.uniform(2, 30, 3), m)
    w.rotated_box([1, 2, 1], [4, 0, -2], 30, m)
    w.quad([0, 99, 0], [10, 0, 0], [0, 0, 10], m)
    data, meta = w.compile()
    assert len(meta.aab) == 6
    covered = sum(1 for c in meta.aaq_class if c == -2)
    assert covered == 36
    # every face row appears exactly once, and lo/hi planes are consistent
    rows = [r for box in meta.aab for r in box]
    assert len(rows) == len(set(rows))
    import numpy as _np
    Q = _np.asarray(data.quad_Q)
    for box in meta.aab:
        for k in range(3):
            assert Q[box[2 * k], k] < Q[box[2 * k + 1], k]


def test_aab_fast_path_parity():
    """Closed-box slab fast path: scenes dominated by box() geometry (the
    final_scene ground grid, mort.cu:508-518) must produce identical
    closest hits to the XLA intersector — the slab entry/exit IS the
    per-face closest hit for a closed box (objects.cuh:190-215 semantics
    via utils.h:51-67 construction)."""
    rng = np.random.RandomState(11)
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(4):
        for j in range(4):
            lo = np.array([i * 4.0 - 8.0, 0.0, j * 4.0 - 8.0])
            w.box(lo, lo + [4.0, rng.uniform(0.5, 4.0), 4.0], m)
    w.quad([-8, 9, -8], [6, 0, 0], [0, 0, 6], m)          # lone aaq quad
    w.rotated_box([1, 2, 1], [0, 4, 0], 25, m)            # general quads
    for _ in range(8):
        w.sphere(rng.uniform(-8, 8, 3) + [0, 5, 0], 0.6 + rng.rand(), m)
    data, meta = w.compile()
    assert len(meta.aab) == 16
    _check_parity(w, accel="none", spread=10.0)


def test_aab_inside_box_parity():
    """Rays originating inside a box must hit the exit face (the reference's
    double-sided quads); slab path = exit slab for interior origins."""
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    w.box([-5, -5, -5], [5, 5, 5], m)
    data, meta = w.compile()
    assert len(meta.aab) == 1
    qf = quad_frames(data)
    table, _ = build_prim_table(data, meta, qf)
    rng = np.random.RandomState(3)
    n = 256
    ro = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)   # inside
    rd = jnp.asarray(rng.randn(n, 3), jnp.float32)
    tme = jnp.zeros(n, jnp.float32)
    bt, bk, bi = intersect_best(data, meta, qf, ro, rd, tme,
                                jnp.uint32(1), jnp.zeros(n, jnp.int32),
                                jnp.zeros(n, jnp.int32), 0)
    pt_, pk, pi, _ = pal.closest_hit_pallas(data, meta, qf, table, ro, rd,
                                            tme, interpret=True, accel="none")
    assert np.isfinite(np.asarray(bt)).all()     # closed box: always a hit
    np.testing.assert_allclose(np.asarray(pt_), np.asarray(bt),
                               rtol=3e-5, atol=1e-5)
    assert (np.asarray(pk) == np.asarray(bk)).all()
    assert (np.asarray(pi) == np.asarray(bi)).all()


def test_all_miss():
    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    w.sphere([0, 0, -100], 1.0, m)
    data, meta = w.compile()
    qf = quad_frames(data)
    table, _ = build_prim_table(data, meta, qf)
    n = 128
    ro = jnp.zeros((n, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    tme = jnp.zeros(n, jnp.float32)
    t, k, i, row = pal.closest_hit_pallas(data, meta, qf, table, ro, rd, tme,
                                          interpret=True)
    assert not np.isfinite(np.asarray(t)).any()
    assert (np.asarray(k) == 0).all()


# ---------------------------------------------------------------------------
# custom VJP: gradients through the kernel
# ---------------------------------------------------------------------------

def _grads_for(w, cam, use_pallas, pallas_accel=None):
    from mort_tpu.render.renderer import radiance_for_pixels
    from mort_tpu.parallel.sharding import _extract_diff

    data, meta = w.compile()
    pix = jnp.arange(cam.image_width * cam.image_height, dtype=jnp.int32)
    diff0 = _extract_diff(data)

    def loss(diff):
        d = data.replace(**diff)
        img = radiance_for_pixels(d, meta, cam, jnp.uint32(5), pix,
                                  differentiable=True,
                                  use_pallas=use_pallas,
                                  pallas_interpret=True,
                                  pallas_accel=pallas_accel)
        return jnp.mean(img * jnp.asarray([0.6, 0.3, 0.1]))

    val, grads = jax.value_and_grad(loss)(diff0)
    return float(val), {k: np.asarray(v) for k, v in grads.items()}


def test_vjp_gradients_match_xla_path():
    """Reverse-mode through the kernel (custom VJP, analytic winner
    recompute) must match the XLA intersector's gradients — the same
    detached-argmin policy, so values AND grads agree to float tolerance."""
    w = _mixed_world(n_sph=5, n_quad=3)
    cam = make_camera(image_width=12, samples_per_pixel=4, bounce_limit=4,
                      vfov=60, lookfrom=[0, 1, 8], lookat=[0, 0, 0])
    v_x, g_x = _grads_for(w, cam, use_pallas=False)
    v_p, g_p = _grads_for(w, cam, use_pallas=True)
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
    some_signal = 0.0
    for k in g_x:
        np.testing.assert_allclose(g_p[k], g_x[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)
        some_signal += np.abs(g_x[k]).sum()
    assert some_signal > 0


def test_vjp_gradients_bvh_scale():
    """Gradients through the FORCED "bvh" accel at 660-prim scale: reverse
    mode runs the custom VJP behind the packet heap traversal (the
    production auto policy would route this size through "none"; the heap
    path keeps VJP coverage here).  (a) grads match the XLA intersector's,
    (b) the grad of a scalar loss matches central finite differences on a
    smooth parameter (albedo — multilinear in the path estimator, so FD is
    clean)."""
    w = _mixed_world(n_sph=400, n_quad=260, moving=True)
    data, meta = w.compile()
    assert pal.auto_accel(meta.n_spheres + meta.n_quads) == "none"
    cam = make_camera(image_width=8, samples_per_pixel=4, bounce_limit=3,
                      vfov=60, lookfrom=[0, 1, 8], lookat=[0, 0, 0])
    v_x, g_x = _grads_for(w, cam, use_pallas=False)
    v_p, g_p = _grads_for(w, cam, use_pallas=True, pallas_accel="bvh")
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
    some_signal = 0.0
    for k in g_x:
        np.testing.assert_allclose(g_p[k], g_x[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)
        some_signal += np.abs(g_x[k]).sum()
    assert some_signal > 0

    # finite differences through the kernel path (BASELINE: pixel-grad
    # allclose vs FD; here at bvh scale via the scalar loss)
    from mort_tpu.render.renderer import radiance_for_pixels

    pix = jnp.arange(cam.image_width * cam.image_height, dtype=jnp.int32)

    def loss_at(eps):
        d = data.replace(tex_color=data.tex_color.at[0, 0].add(eps))
        img = radiance_for_pixels(d, meta, cam, jnp.uint32(5), pix,
                                  differentiable=True, use_pallas=True,
                                  pallas_interpret=True,
                                  pallas_accel="bvh")
        return float(jnp.mean(img * jnp.asarray([0.6, 0.3, 0.1])))

    e = 1e-2
    fd = (loss_at(e) - loss_at(-e)) / (2 * e)
    auto = float(g_p["tex_color"][0, 0])
    np.testing.assert_allclose(auto, fd, rtol=5e-3, atol=1e-7)


def test_vjp_gradients_match_xla_path_moving_and_media():
    """Motion blur + a constant medium: t-gradients flow through the
    moving-sphere coefficient rows; media override (outside the kernel)
    keeps its own path."""
    w = _mixed_world(n_sph=6, n_quad=2, moving=True)
    iso = w.lambertian(w.solid_color([0.4, 0.4, 0.9]))
    b = w.sphere([0, 0, 0], 2.5, w.dielectric(1.5), skip=True)
    w.constant_medium(b, 0.3, iso)
    cam = make_camera(image_width=10, samples_per_pixel=4, bounce_limit=4,
                      vfov=60, lookfrom=[0, 1, 8], lookat=[0, 0, 0])
    v_x, g_x = _grads_for(w, cam, use_pallas=False)
    v_p, g_p = _grads_for(w, cam, use_pallas=True)
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
    for k in g_x:
        np.testing.assert_allclose(g_p[k], g_x[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)


def test_fd_gradients_bvh_scale_geometry_and_ior():
    """FD truth under FORCED accel="bvh" at 662-prim scale for GEOMETRY
    (sphere center) and dielectric ior — the parameters whose gradients
    flow through the kernel's analytic t-recompute (_t_winner), not just
    the shading join.  (Production auto policy routes this size through
    "none"; forcing "bvh" keeps the heap path's FD coverage.)

    Methodology (test_gradients._check_pixel_grads lifted to the kernel
    path, which is reverse-mode only): per-pixel central FD images at two
    step sizes give a silhouette/branch-flip stability mask — autodiff
    computes the frozen-visibility interior derivative, so silhouette
    pixels are EXPECTED to disagree and are excluded — then ONE vjp of an
    FD-stable-weighted scalar loss is compared against the same weighting
    of the FD image."""
    from mort_tpu.render.renderer import radiance_for_pixels
    from mort_tpu.parallel.sharding import _extract_diff

    w = _mixed_world(n_sph=400, n_quad=260, moving=True)
    # a big SMOOTH-textured hero sphere and a big glass sphere, placed WELL
    # CLEAR of the 660-prim field (which occupies |xyz| ~< 10) with the
    # camera right on them: geometry/ior FD needs unoccluded interior
    # pixels with a real local derivative; the field still rides along in
    # the packet-heap traversal every ray performs
    # glass IN FRONT of the marble hero: the refracted direction lands on a
    # smoothly varying texture, so d/d(ior) has a REAL interior derivative
    # (against the constant-background sky it would be branch-flips only);
    # bounce_limit must let through-glass paths reach the marble AND then
    # the sky, or they die at the depth limit and contribute exactly zero
    hero = w.sphere([0.0, 1.0, 30.0], 1.4, w.lambertian(w.noise_texture(0.5)))
    w.sphere([0.5, 1.0, 32.2], 0.7, w.dielectric(1.5))
    data, meta = w.compile()
    assert pal.auto_accel(meta.n_spheres + meta.n_quads) == "none"
    cam = make_camera(image_width=16, aspect_ratio=1.0,
                      samples_per_pixel=4, bounce_limit=5,
                      vfov=50, lookfrom=[0, 1, 33.8], lookat=[0, 1, 30])
    pix = jnp.arange(cam.image_width * cam.image_height, dtype=jnp.int32)
    # compiled row of the hero sphere (rows are Morton-permuted)
    cent = np.asarray(data.sph_center)
    hero_row = int(np.argmin(((cent - np.array([0.0, 1.0, 30.0])) ** 2).sum(1)))

    def img_with(field, idx, eps):
        arr = getattr(data, field)
        d = data.replace(**{field: arr.at[idx].add(eps)})
        out = radiance_for_pixels(d, meta, cam, jnp.uint32(5), pix,
                                  differentiable=True, use_pallas=True,
                                  pallas_interpret=True,
                                  pallas_accel="bvh")
        return np.asarray(out).sum(-1)           # [P] luma-ish

    def fd_check(field, idx, e1):
        fd1 = (img_with(field, idx, e1) - img_with(field, idx, -e1)) / (2 * e1)
        e2 = e1 / 3.0
        fd2 = (img_with(field, idx, e2) - img_with(field, idx, -e2)) / (2 * e2)
        stable = (np.abs(fd1 - fd2)
                  <= 0.07 * np.maximum(np.abs(fd1), np.abs(fd2)) + 1e-3)
        wgt = np.where(stable, 1.0, 0.0).astype(np.float32)
        if (np.abs(fd2) * wgt).max() < 1e-3:
            return None                          # no stable interior signal
        diff0 = _extract_diff(data)

        def loss(diff):
            d = data.replace(**diff)
            img = radiance_for_pixels(d, meta, cam, jnp.uint32(5), pix,
                                      differentiable=True, use_pallas=True,
                                      pallas_interpret=True,
                                      pallas_accel="bvh")
            return jnp.sum(img.sum(-1) * jnp.asarray(wgt))

        auto = float(np.asarray(jax.grad(loss)(diff0)[field])[idx])
        want = float((fd2 * wgt).sum())
        np.testing.assert_allclose(auto, want, rtol=0.1,
                                   atol=0.05 * np.abs(fd2 * wgt).max(),
                                   err_msg=f"{field}[{idx}]")
        return True

    # hero sphere center: >= 2 axes must have stable interior FD that
    # matches the kernel-path autodiff
    hits = 0
    for ax in (0, 1, 2):
        if fd_check("sph_center", (hero_row, ax), 2e-3):
            hits += 1
    assert hits >= 2, f"only {hits} checked sphere-center FD components"

    # dielectric ior (the glass sphere's material row, found by ior value)
    glass_row = int(np.argmax(np.asarray(data.mat_ior)))
    assert fd_check("mat_ior", (glass_row,), 2e-3), "ior FD failed"


def test_fd_gradient_through_train_step_cornell():
    """FD truth through make_train_step itself on cornell over the 8-mesh:
    the full production gradient path (sharded loss, GSPMD psum, diff-leaf
    extract/merge) must return d(loss)/d(param) that matches central finite
    differences of the step's own loss."""
    from mort_tpu.parallel.sharding import make_mesh, make_train_step
    from mort_tpu.render.renderer import render
    from mort_tpu.scene import scenes as sc

    world, cam = sc.cornell_box()
    data, meta = world.compile()
    cam = cam.replace(image_width=12, image_height=12, sqrt_spp=2,
                      bounce_limit=6)
    target = np.asarray(render(data, meta, cam)) * 0.9
    step = make_train_step(meta, make_mesh(8))
    loss0, grads = step(data, cam, target)
    loss0 = float(loss0)
    assert np.isfinite(loss0)

    def loss_with(field, idx, eps):
        arr = getattr(data, field)
        d = data.replace(**{field: arr.at[idx].add(eps)})
        l, _ = step(d, cam, target)
        return float(l)

    checked = 0
    for field, idx, e1 in (
            ("tex_color", (0, 0), 1e-2),         # emission/albedo leaves
            ("mat_ior", (np.argmax(np.asarray(data.mat_ior)),), 2e-3),
            ("quad_Q", (0, 0), 2e-2)):           # wall geometry
        auto = float(np.asarray(grads[field])[idx])
        f = lambda e: loss_with(field, idx, e)
        fd1 = (f(e1) - f(-e1)) / (2 * e1)
        fd2 = (f(e1 / 2) - f(-e1 / 2)) / e1
        if abs(fd1 - fd2) > 0.05 * max(abs(fd1), abs(fd2)) + 1e-7:
            continue                              # branch-flip unstable
        np.testing.assert_allclose(auto, fd2, rtol=0.05, atol=1e-6,
                                   err_msg=f"{field}[{idx}]")
        if abs(fd2) > 1e-8:
            checked += 1
    assert checked >= 2, f"only {checked} stable FD components"


def test_limb_packed_dot_algebra():
    """The K-packed limb formulation itself (table columns stacked per
    _PAIR_A, ray-basis rows per _PAIR_B, one bf16-input dot) must
    reproduce the f64 coefficient products to ~2^-24 relative.  Run
    EAGERLY on purpose: under jit XLA's simplifier may eliminate the
    x - f32(bf16(x)) limb pattern (the reason interpret-mode kernels use
    plain f32 dots, _coef_dot docstring); eager execution pins the pure
    algebra, and the real Mosaic kernel's bit-exact agreement with this
    algebra is verified on hardware each round (tools/tpu_parity.py)."""
    rng = np.random.RandomState(11)
    rows, K = 64, pal.K_LIN
    # coefficient magnitudes spanning the scene-1 regime (|c| ~ 1e3,
    # |c^2 - r^2| ~ 1e6) plus O(1) terms
    tbl = np.zeros((rows, K), np.float32)
    tbl[:, :pal.K_LIVE] = (rng.randn(rows, pal.K_LIVE)
                           * np.power(10.0, rng.uniform(-1, 6, (rows, 1)))
                           ).astype(np.float32)
    rays = np.zeros((8, 128), np.float32)
    rays[:3] = rng.uniform(-60, 60, (3, 128))     # ro
    d = rng.randn(3, 128); rays[3:6] = d / np.linalg.norm(d, axis=0)
    rays[6] = rng.rand(128)

    A = pal._limb_pack_rows(jnp.asarray(tbl))
    B = pal._ray_basis_packed(jnp.asarray(rays))
    got = np.asarray(pal._dotp(A, B), np.float64)

    ref = (np.asarray(tbl, np.float64)
           @ np.asarray(pal._ray_basis(jnp.asarray(rays)), np.float64))
    scale = np.maximum(np.abs(np.asarray(tbl, np.float64)).max(axis=1,
                                                                keepdims=True)
                       * np.abs(np.asarray(pal._ray_basis(
                           jnp.asarray(rays)), np.float64)).max(axis=0),
                       1e-30)
    rel = np.abs(got - ref) / scale
    assert rel.max() < 2.0 ** -20, rel.max()
