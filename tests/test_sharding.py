"""Multi-device sharding on the 8-device virtual CPU mesh (SURVEY.md sec. 4):
sharded renders must be identical to single-device renders (counter RNG keys
by pixel id, so sharding cannot change any sample), and scene-parameter
gradients of a sharded loss must be finite and match the unsharded ones.
"""

import jax
import numpy as np

from conftest import assert_images_close

from mort_tpu.parallel.sharding import make_mesh, make_train_step, render_sharded
from mort_tpu.render.renderer import render
from mort_tpu.render.wavefront import render_wavefront


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    single = np.asarray(render(data, meta, cam))
    for n in (2, 8):
        mesh = make_mesh(n)
        sharded = render_sharded(data, meta, cam, mesh)
        # Identical samples per pixel; only reduction order may differ.
        assert_images_close(sharded, single, frac_ok=1.0, atol=1e-5,
                            mean_tol=1e-6, msg=f"mesh{n}")


def test_wavefront_sharded_bit_identical(three_sphere_scene):
    """The fast path takes a mesh: renders are BIT-identical on 1/2/8
    devices (layer-aligned deposits + counter RNG, wavefront.py docstring),
    and match the lockstep integrator."""
    data, meta, cam = three_sphere_scene
    single = np.asarray(render(data, meta, cam))
    imgs = {}
    for n in (1, 2, 8):
        imgs[n] = np.asarray(render_wavefront(data, meta, cam, spt=2,
                                              mesh=make_mesh(n)))
    assert np.array_equal(imgs[2], imgs[1])
    assert np.array_equal(imgs[8], imgs[1])
    assert_images_close(imgs[8], single, frac_ok=0.98, atol=2e-2,
                        mean_tol=4e-3, msg="wavefront mesh8 vs lockstep")


def test_wavefront_sharded_balance(three_sphere_scene):
    """Round-robin pixel interleaving balances per-shard work: the useful
    path-segment counts of the 8 shards must be within 20% of each other."""
    data, meta, cam = three_sphere_scene
    _, stats = render_wavefront(data, meta, cam, spt=2, mesh=make_mesh(8),
                                return_stats=True)
    useful = np.asarray(stats["per_shard_useful"])
    assert useful.shape == (8,)
    assert useful.min() > 0
    assert useful.max() <= 1.2 * useful.min(), useful


def test_sharded_train_step_cornell():
    """Training step on the cornell box (lights + MIS + dielectric +
    instanced boxes) over the 8-mesh: the full BASELINE config-5 gradient
    path at test scale.  Loss/grads must be finite, carry signal in the
    geometry/material/emission leaves, and match the 1-device step."""
    from mort_tpu.scene import scenes as sc

    world, cam = sc.cornell_box()
    data, meta = world.compile()
    cam = cam.replace(image_width=12, image_height=12, sqrt_spp=2,
                      bounce_limit=8)
    target = np.asarray(render(data, meta, cam)) * 0.9

    l1, g1 = jax.tree.map(np.asarray,
                          make_train_step(meta, make_mesh(1))(data, cam, target))
    l8, g8 = jax.tree.map(np.asarray,
                          make_train_step(meta, make_mesh(8))(data, cam, target))
    assert np.isfinite(l1) and np.isfinite(l8)
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    for k in g1:
        assert np.isfinite(g1[k]).all(), k
        np.testing.assert_allclose(g1[k], g8[k], rtol=5e-3, atol=1e-5,
                                   err_msg=k)
    # signal in the cornell-specific leaves: walls/lamp (quads), glass
    # sphere ior, emission color
    assert np.abs(g8["quad_Q"]).max() > 0
    assert np.abs(g8["mat_ior"]).max() > 0
    assert np.abs(g8["tex_color"]).max() > 0


def test_sharded_grads(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    target = np.asarray(render(data, meta, cam)) * 0.9

    g1 = make_train_step(meta, make_mesh(1))(data, cam, target)
    g8 = make_train_step(meta, make_mesh(8))(data, cam, target)
    loss1, grads1 = jax.tree.map(np.asarray, g1)
    loss8, grads8 = jax.tree.map(np.asarray, g8)

    assert np.isfinite(loss1) and np.isfinite(loss8)
    np.testing.assert_allclose(loss1, loss8, rtol=1e-4)
    # some gradient signal must exist
    assert np.abs(grads8["sph_center"]).max() > 0
    for k in grads1:
        np.testing.assert_allclose(grads1[k], grads8[k], rtol=5e-3, atol=1e-5,
                                   err_msg=k)


_COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")


def _collective_counts(hlo_text: str) -> dict:
    """Occurrences of each inter-device collective in compiled HLO text
    (counting -start variants once, not their matching -done)."""
    import re
    return {op: len(re.findall(rf"{op}(?:-start)?\(", hlo_text))
            for op in _COLLECTIVE_OPS}


def test_hlo_sharded_forward_zero_collectives(three_sphere_scene):
    """The scaling-efficiency claim, statically: the sharded wavefront
    forward is embarrassingly parallel — its compiled HLO over the 8-device
    mesh must contain ZERO inter-device collectives (the analogue of the
    reference's independent pixel grid, mort.cu:98-106).  Audited for both
    the XLA intersector and the (interpret-mode) Pallas kernel path."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mort_tpu.render.wavefront import _sharded_span

    data, meta, cam = three_sphere_scene
    mesh = make_mesh(8)
    n = 8
    WH = cam.image_width * cam.image_height
    per = -(-WH // n)
    fb = jax.device_put(jnp.zeros((n * per, 3), jnp.float32),
                        NamedSharding(mesh, P(tuple(mesh.axis_names))))
    repl = NamedSharding(mesh, P())
    data_d = jax.device_put(data, repl)
    cam_d = jax.device_put(cam, repl)
    for use_pallas in (False, True):
        span = _sharded_span(mesh, meta, 1024, 512, 3, use_pallas, 2, per,
                             use_pallas)   # pallas_interpret = use_pallas
        hlo = span.lower(data_d, cam_d, jnp.uint32(1), fb,
                         jnp.uint32(0), jnp.uint32(per)).compile().as_text()
        counts = _collective_counts(hlo)
        assert all(v == 0 for v in counts.values()), \
            f"use_pallas={use_pallas}: forward HLO has collectives {counts}"


def test_hlo_train_step_psum_only(three_sphere_scene):
    """The train step's compiled HLO must communicate ONLY through gradient
    all-reduces (the psums of the replicated scene leaves — possibly
    combined by XLA) plus the scalar loss reduction: no all-gather /
    all-to-all / collective-permute / reduce-scatter, and at least one
    all-reduce.  This pins the communication pattern the ICI/DCN scaling
    model in PERF.md assumes."""
    from mort_tpu.parallel.sharding import _DIFF_FIELDS

    data, meta, cam = three_sphere_scene
    target = np.asarray(render(data, meta, cam)) * 0.9
    step = make_train_step(meta, make_mesh(8))
    hlo = step.lower_hlo(data, cam, target)
    counts = _collective_counts(hlo)
    assert counts["all-reduce"] >= 1, counts
    # loss-mean + grad psums; XLA may combine some, never exceed leaves+1
    assert counts["all-reduce"] <= len(_DIFF_FIELDS) + 1, counts
    for op in ("all-gather", "reduce-scatter", "collective-permute",
               "all-to-all"):
        assert counts[op] == 0, counts


def test_2d_mesh_wavefront_bit_identical(three_sphere_scene):
    """SURVEY §7 ("dcn","ici") 2-D mesh: the wavefront render over a 2x4
    hosts-by-chips mesh is BIT-identical to the 1-D 8-mesh and the 1-device
    render (the two axes flatten to one data-parallel pixel axis)."""
    data, meta, cam = three_sphere_scene
    mesh2d = make_mesh(shape=(2, 4))
    assert mesh2d.axis_names == ("dcn", "ici")
    img2d = np.asarray(render_wavefront(data, meta, cam, spt=2, mesh=mesh2d))
    img1d = np.asarray(render_wavefront(data, meta, cam, spt=2,
                                        mesh=make_mesh(8)))
    img1 = np.asarray(render_wavefront(data, meta, cam, spt=2,
                                       mesh=make_mesh(1)))
    assert np.array_equal(img2d, img1d)
    assert np.array_equal(img2d, img1)


def test_2d_mesh_train_step_matches(three_sphere_scene):
    """Gradient psum over the 2-D mesh (ICI-first, then DCN) must agree
    with the 1-D 8-mesh and the single device."""
    data, meta, cam = three_sphere_scene
    target = np.asarray(render(data, meta, cam)) * 0.9

    l1, g1 = jax.tree.map(np.asarray,
                          make_train_step(meta, make_mesh(1))(data, cam, target))
    l2d, g2d = jax.tree.map(
        np.asarray,
        make_train_step(meta, make_mesh(shape=(2, 4)))(data, cam, target))
    assert np.isfinite(l2d)
    np.testing.assert_allclose(l1, l2d, rtol=1e-4)
    for k in g1:
        np.testing.assert_allclose(g1[k], g2d[k], rtol=5e-3, atol=1e-5,
                                   err_msg=k)
