"""Progressive rendering with checkpoint/resume.

The reference recomputes every sample of every pixel each frame and keeps no
accumulation state (update loop mort.cu:93-120; camera.cuh:186-194) — its
only "progress" is re-running.  The TPU rebuild accumulates stratified
samples across steps in a float32 framebuffer and can checkpoint/resume
long renders (SURVEY.md section 5, checkpoint/resume row): the state is the
partial sample sum plus the sample cursor; the counter-based RNG guarantees
a resumed render is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..rng import DEFAULT_SEED
from ..scene.build import SceneData, SceneMeta
from .renderer import radiance_for_pixels


@dataclasses.dataclass
class RenderState:
    """Accumulated partial render: sum of per-sample radiance scaled by
    1/spp_total, plus the next sample index."""
    fb: np.ndarray          # [H, W, 3] partial estimator (sums to the mean)
    samples_done: int
    seed: int
    spp_total: int = 0

    @property
    def image(self) -> np.ndarray:
        """Current estimate rescaled to a proper mean for previews."""
        if self.samples_done in (0, self.spp_total) or self.spp_total == 0:
            return self.fb
        return self.fb * (self.spp_total / self.samples_done)


@functools.partial(jax.jit, static_argnames=("meta", "chunk", "n_samples"))
def _step(data: SceneData, cam: Camera, seed, pixel_ids, sample_offset, *,
          meta: SceneMeta, chunk: int, n_samples: int):
    return radiance_for_pixels(data, meta, cam, seed, pixel_ids,
                               chunk=chunk, sample_offset=sample_offset,
                               n_samples=n_samples)


def render_progressive(data: SceneData, meta: SceneMeta, cam: Camera,
                       seed=DEFAULT_SEED, samples_per_step=None,
                       state: RenderState | None = None,
                       checkpoint_path: str | None = None,
                       checkpoint_every=1, chunk=512, on_step=None):
    """Render in sample-steps, optionally checkpointing after each.

    Returns the final RenderState; ``state.fb`` is the NaN-scrubbed mean
    image once all spp are accumulated.
    """
    W, H = cam.image_width, cam.image_height
    spp = cam.sqrt_spp ** 2
    if samples_per_step is None:
        samples_per_step = max(1, cam.sqrt_spp)
    if state is None:
        state = RenderState(fb=np.zeros((H, W, 3), np.float32),
                            samples_done=0, seed=seed, spp_total=spp)
    state.spp_total = spp
    assert state.seed == seed, "resume must use the original seed"

    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
    step_idx = 0
    while state.samples_done < spp:
        n = min(samples_per_step, spp - state.samples_done)
        acc = _step(data, cam, jnp.uint32(seed), pixel_ids,
                    jnp.int32(state.samples_done),
                    meta=meta, chunk=chunk, n_samples=int(n))
        state.fb = state.fb + np.asarray(acc).reshape(H, W, 3)
        state.samples_done += n
        step_idx += 1
        if checkpoint_path and step_idx % checkpoint_every == 0:
            save_state(checkpoint_path, state)
        if on_step is not None:
            on_step(state)

    state.fb = np.where(np.isnan(state.fb), 0.0, state.fb)
    if checkpoint_path:
        save_state(checkpoint_path, state)
    return state


def render_progressive_wavefront(data: SceneData, meta: SceneMeta,
                                 cam: Camera, seed=DEFAULT_SEED, spt=None,
                                 layers_per_step=1,
                                 state: RenderState | None = None,
                                 checkpoint_path: str | None = None,
                                 checkpoint_every=1, mesh=None, on_step=None,
                                 **wf_kwargs):
    """Progressive accumulation on the wavefront fast path.

    The sample space is split into *layers* of ``spt`` stratified samples per
    pixel (wavefront.py docstring); each step renders ``layers_per_step`` of
    them via the wavefront's layer-aligned spans.  Because each pixel
    receives exactly one framebuffer add per layer, a resumed render is
    BIT-identical to an uninterrupted one — independently of where the
    interruption fell, of the lane-pool scheduling, and even of the mesh
    size: the checkpointed accumulator is kept in canonical pixel order, so
    a render started on N chips can resume on M (elastic restart).

    ``state.samples_done`` advances in whole layers (``spt`` samples each);
    resume must use the same ``seed`` and ``spt``.
    """
    from .wavefront import render_wavefront

    W, H = cam.image_width, cam.image_height
    spp = cam.sqrt_spp ** 2
    if spt is None:
        spt = min(spp, 16)
    n_layers = -(-spp // spt)
    if state is None:
        state = RenderState(fb=np.zeros((H, W, 3), np.float32),
                            samples_done=0, seed=seed, spp_total=spp)
    state.spp_total = spp
    assert state.seed == seed, "resume must use the original seed"
    if state.samples_done >= spp:
        layers_done = n_layers
    else:
        assert state.samples_done % spt == 0, \
            "resume must use the original spt (layer size)"
        layers_done = state.samples_done // spt

    step_idx = 0
    while layers_done < n_layers:
        l1 = min(layers_done + layers_per_step, n_layers)
        img = render_wavefront(data, meta, cam, seed=seed, spt=spt,
                               mesh=mesh, fb=state.fb.reshape(W * H, 3),
                               layer_range=(layers_done, l1),
                               scrub_nan=False, **wf_kwargs)
        state.fb = np.asarray(img).reshape(H, W, 3)
        layers_done = l1
        state.samples_done = min(layers_done * spt, spp)
        step_idx += 1
        if checkpoint_path and step_idx % checkpoint_every == 0:
            save_state(checkpoint_path, state)
        if on_step is not None:
            on_step(state)

    state.fb = np.where(np.isnan(state.fb), 0.0, state.fb)
    if checkpoint_path:
        save_state(checkpoint_path, state)
    return state


def save_state(path: str, state: RenderState) -> None:
    """Atomic npz checkpoint write."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, fb=state.fb,
                                samples_done=np.int64(state.samples_done),
                                seed=np.int64(state.seed),
                                spp_total=np.int64(state.spp_total))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> RenderState:
    with np.load(path) as z:
        return RenderState(fb=z["fb"].copy(),
                           samples_done=int(z["samples_done"]),
                           seed=int(z["seed"]),
                           spp_total=int(z.get("spp_total", 0)))
