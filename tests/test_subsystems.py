"""Tests for the auxiliary subsystems (SURVEY.md section 5): progressive
rendering + checkpoint/resume (both integrator paths, including elastic
mesh-size changes across a resume), image IO, metrics, and the interactive
camera controller."""

import io
import os

import numpy as np
import pytest

from conftest import assert_images_close

from mort_tpu.render.progressive import (
    RenderState, load_state, render_progressive,
    render_progressive_wavefront, save_state,
)
from mort_tpu.render.renderer import radiance_for_pixels, render, to_u8_np
from mort_tpu.render.wavefront import render_wavefront
from mort_tpu.parallel.sharding import make_mesh


# ---------------------------------------------------------------------------
# progressive + checkpoint/resume
# ---------------------------------------------------------------------------

def test_progressive_lockstep_matches_oneshot(three_sphere_scene):
    data, meta, cam = three_sphere_scene
    one = render_progressive(data, meta, cam, samples_per_step=cam.sqrt_spp ** 2)
    three = render_progressive(data, meta, cam, samples_per_step=2)
    assert one.samples_done == three.samples_done == cam.sqrt_spp ** 2
    # same samples; the per-call 1/spp scaling rounds differently per split
    np.testing.assert_allclose(one.fb, three.fb, atol=1e-6)
    assert_images_close(one.fb, np.asarray(render(data, meta, cam)),
                        frac_ok=1.0, atol=1e-5, mean_tol=1e-6)


def test_progressive_lockstep_checkpoint_resume(three_sphere_scene, tmp_path):
    data, meta, cam = three_sphere_scene
    ckpt = str(tmp_path / "state.npz")

    full = render_progressive(data, meta, cam, samples_per_step=1)

    # interrupt after 2 of 4 samples, reload from disk, continue
    render_progressive_interrupted(
        render_progressive, data, meta, cam, samples_per_step=1,
        checkpoint_path=ckpt, on_step=_StopAfter(2))
    loaded = load_state(ckpt)
    assert loaded.samples_done == 2 and loaded.seed == 69420
    resumed = render_progressive(data, meta, cam, samples_per_step=1,
                                 state=loaded)
    assert resumed.samples_done == cam.sqrt_spp ** 2
    assert np.array_equal(resumed.fb, full.fb)


class _StopAfter:
    """on_step callback that raises StopIteration-like interruption."""

    def __init__(self, n):
        self.n = n

    def __call__(self, state):
        if state.samples_done >= self.n:
            raise _Interrupted


class _Interrupted(BaseException):
    pass


def render_progressive_interrupted(fn, *args, **kwargs):
    try:
        return fn(*args, **kwargs)
    except _Interrupted:
        return None


def test_progressive_wavefront_resume_bit_identical(three_sphere_scene,
                                                    tmp_path):
    """The wavefront checkpoint claim: resumed == uninterrupted, bit-exact
    (layer-aligned deposits, progressive.py docstring)."""
    data, meta, cam = three_sphere_scene
    ckpt = str(tmp_path / "wf.npz")

    full = render_progressive_wavefront(data, meta, cam, spt=1)
    assert full.samples_done == cam.sqrt_spp ** 2

    render_progressive_interrupted(
        render_progressive_wavefront, data, meta, cam, spt=1,
        checkpoint_path=ckpt, on_step=_StopAfter(2))
    loaded = load_state(ckpt)
    assert 0 < loaded.samples_done < cam.sqrt_spp ** 2
    resumed = render_progressive_wavefront(data, meta, cam, spt=1,
                                           state=loaded)
    assert np.array_equal(resumed.fb, full.fb)

    # and the wavefront one-shot render agrees (same samples, possibly
    # different float accumulation order)
    oneshot = np.asarray(render_wavefront(data, meta, cam, spt=1))
    np.testing.assert_allclose(full.fb, oneshot, atol=1e-5)


def test_progressive_wavefront_elastic_mesh_resume(three_sphere_scene,
                                                   tmp_path):
    """Elastic restart: a render checkpointed on an 8-device mesh resumes on
    2 devices (and on 1) with a BIT-identical result — the canonical-order
    accumulator + layer alignment make the mesh size invisible."""
    data, meta, cam = three_sphere_scene
    ckpt = str(tmp_path / "wf8.npz")

    full_1dev = render_progressive_wavefront(data, meta, cam, spt=1,
                                             mesh=make_mesh(1))

    render_progressive_interrupted(
        render_progressive_wavefront, data, meta, cam, spt=1,
        mesh=make_mesh(8), checkpoint_path=ckpt, on_step=_StopAfter(2))
    loaded = load_state(ckpt)
    assert 0 < loaded.samples_done < cam.sqrt_spp ** 2
    resumed = render_progressive_wavefront(data, meta, cam, spt=1,
                                           mesh=make_mesh(2), state=loaded)
    assert np.array_equal(resumed.fb, full_1dev.fb)


def test_save_state_atomic_and_partial_image_scaling(tmp_path):
    fb = np.full((2, 2, 3), 0.25, np.float32)
    st = RenderState(fb=fb, samples_done=2, seed=7, spp_total=8)
    # partial estimator rescaled to a proper mean for previews
    assert np.allclose(st.image, fb * 4.0)
    path = str(tmp_path / "s.npz")
    save_state(path, st)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp.npz")]
    back = load_state(path)
    assert back.samples_done == 2 and back.seed == 7 and back.spp_total == 8
    assert np.array_equal(back.fb, fb)


# ---------------------------------------------------------------------------
# io/image
# ---------------------------------------------------------------------------

def _decode_png(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def test_save_png_roundtrip_and_flip(tmp_path):
    from mort_tpu.io.image import save_png

    u8 = (np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3) * 5) % 251
    p = str(tmp_path / "a.png")
    save_png(p, u8)
    back = _decode_png(p)
    # writers flip the bottom-up framebuffer to top-down file order
    assert np.array_equal(back, u8[::-1])


def test_save_png_gamma_pipeline(tmp_path):
    from mort_tpu.io.image import save_png

    lin = np.full((2, 2, 3), 0.25, np.float32)
    p = str(tmp_path / "g.png")
    save_png(p, lin)
    back = _decode_png(p)
    # gamma-2: sqrt(0.25)=0.5 -> 256*0.5 = 128 (utils.h:41-43 pipeline)
    assert np.all(back == 128)


def test_pure_png_encoder_matches_pil(tmp_path):
    from mort_tpu.io.image import _save_png_pure

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    p = str(tmp_path / "pure.png")
    _save_png_pure(p, arr)
    assert np.array_equal(_decode_png(p), arr)


def test_npz_roundtrip(tmp_path):
    from mort_tpu.io.image import load_npz, save_npz

    img = np.random.RandomState(0).rand(3, 4, 3).astype(np.float32)
    p = str(tmp_path / "x.npz")
    save_npz(p, img, spp=np.int64(16))
    back = load_npz(p)
    assert np.array_equal(back["image"], img)
    assert int(back["spp"]) == 16


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_frame_timer_and_metrics(three_sphere_scene):
    from mort_tpu.metrics import FrameTimer, log_metrics, render_metrics, timed

    data, meta, cam = three_sphere_scene
    buf = io.StringIO()
    timer = FrameTimer(log=buf)
    with timer.frame():
        pass
    with timer.frame():
        pass
    assert timer.frames == 2 and timer.avg_ms >= 0.0
    timer.print_avg()
    assert "Avg. time per frame:" in buf.getvalue()   # mort.cu:119 format

    m = render_metrics(cam, meta, wall_s=2.0, compile_s=1.0, avg_path_len=3.5)
    n_paths = cam.image_width * cam.image_height * cam.sqrt_spp ** 2
    assert m["paths"] == n_paths
    assert m["paths_per_s"] == round(n_paths / 2.0, 1)
    assert m["ray_segments_per_s"] == round(n_paths * 3.5 / 2.0, 1)
    out = io.StringIO()
    log_metrics(m, log=out)
    import json
    assert json.loads(out.getvalue())["spp"] == cam.sqrt_spp ** 2

    _, secs = timed(lambda: np.zeros(4))
    assert secs >= 0.0


# ---------------------------------------------------------------------------
# interactive camera controller
# ---------------------------------------------------------------------------

def _rodrigues(v, axis, theta):
    k = np.asarray(axis, np.float64)
    k = k / np.linalg.norm(k)
    v = np.asarray(v, np.float64)
    return (v * np.cos(theta) + np.cross(k, v) * np.sin(theta)
            + k * np.dot(k, v) * (1.0 - np.cos(theta)))


def test_rotate_around_matches_rodrigues():
    """vec3.cuh:214-227 decomposition == classic Rodrigues rotation."""
    from mort_tpu.interactive import _rotate_around

    rng = np.random.RandomState(1)
    for _ in range(10):
        v = rng.randn(3)
        axis = rng.randn(3)
        theta = rng.uniform(-2, 2)
        np.testing.assert_allclose(_rotate_around(v, axis, theta),
                                   _rodrigues(v, axis, theta),
                                   rtol=1e-5, atol=1e-6)


def test_camera_controller_wasd(three_sphere_scene):
    from mort_tpu.interactive import CameraController

    _, _, cam = three_sphere_scene
    ctl = CameraController(cam)
    lf0 = np.asarray(cam.lookfrom)
    la0 = np.asarray(cam.lookat)
    w = (lf0 - la0) / np.linalg.norm(lf0 - la0)
    u = np.cross(np.asarray(cam.vup), w)
    u = u / np.linalg.norm(u)

    ctl.key("w")   # forward: -w (mort.cu:52-55)
    np.testing.assert_allclose(np.asarray(ctl.cam.lookfrom), lf0 - w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctl.cam.lookat), la0 - w, atol=1e-6)
    ctl.key("s")   # back out
    ctl.key("d")   # strafe right: +u
    np.testing.assert_allclose(np.asarray(ctl.cam.lookfrom), lf0 + u, atol=1e-5)
    ctl.key("a")
    np.testing.assert_allclose(np.asarray(ctl.cam.lookfrom), lf0, atol=1e-5)


def test_camera_controller_orbit_preserves_distance(three_sphere_scene):
    from mort_tpu.interactive import CameraController

    _, _, cam = three_sphere_scene
    ctl = CameraController(cam)
    d0 = np.linalg.norm(np.asarray(cam.lookat) - np.asarray(cam.lookfrom))
    ctl.mouse_drag(37.0, -12.0)
    d1 = np.linalg.norm(np.asarray(ctl.cam.lookat) - np.asarray(ctl.cam.lookfrom))
    np.testing.assert_allclose(d0, d1, rtol=1e-4)
    assert not np.allclose(np.asarray(ctl.cam.lookat), np.asarray(cam.lookat))
    # lookfrom is the orbit center and must not move (mort.cu:75-87)
    np.testing.assert_allclose(np.asarray(ctl.cam.lookfrom),
                               np.asarray(cam.lookfrom))


def test_view_loop(three_sphere_scene, tmp_path):
    from mort_tpu.interactive import _ansi_preview, view

    data, meta, cam = three_sphere_scene
    log = io.StringIO()
    frame = view(data, meta, cam,
                 commands=[("key", "w"), ("frame",), ("mouse", 10, 0),
                           ("frame",)],
                 out_pattern=str(tmp_path / "f{}.png"), log=log)
    assert frame is not None and np.isfinite(frame).all()
    assert (tmp_path / "f1.png").exists() and (tmp_path / "f2.png").exists()
    assert log.getvalue().count("Avg. time per frame:") == 2

    ansi = _ansi_preview(to_u8_np(frame))
    assert "\x1b[38;2;" in ansi and ansi.endswith("\x1b[0m")
