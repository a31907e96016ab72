"""Multi-chip distribution: pixel/ray sharding over a device mesh.

The reference is strictly single-GPU — its only parallelism is the CUDA
pixel grid, with the scene replicated in __constant__ memory (SURVEY.md
section 2, "Parallelism strategies").  The TPU rebuild introduces
distribution as a first-class component:

* **Data parallelism over rays/pixels**: the flat pixel array is sharded
  along a 1-D (or ("dcn","ici") 2-D) mesh axis with ``NamedSharding``; every
  chip traces its own pixel slice.  The forward pass needs ZERO collectives
  — rays are embarrassingly parallel, exactly like the reference's pixel
  grid, but across chips.

* **Scene replication**: SceneData (the analogue of the __constant__
  registries) is replicated on every chip.

* **Gradient all-reduce**: differentiating a sharded render w.r.t. the
  replicated scene makes XLA insert the psum over the mesh automatically
  (the backward of a broadcast is an all-reduce over ICI/DCN) — the
  TPU-native counterpart of NCCL gradient all-reduce, with the XLA
  latency-hiding scheduler overlapping it with the backward sweep.

Renders are **sharding-invariant**: the counter-based RNG keys by pixel id,
so any mesh shape produces bit-identical samples per pixel.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
same code paths shard over all processes' devices (pixel rows land on the
hosts' chips; DCN only carries the final gather and gradient psums).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..rng import DEFAULT_SEED
from ..scene.build import SceneData, SceneMeta
from ..render.renderer import radiance_for_pixels


def make_mesh(n_devices=None, devices=None, shape=None) -> Mesh:
    """Device mesh for ray/pixel sharding.

    1-D: ``make_mesh(8)`` -> a 'rays' axis over 8 devices.
    2-D: ``make_mesh(shape=(hosts, chips))`` -> the ("dcn", "ici") mesh of
    the SURVEY §7 distribution plan: the outer axis strides across hosts
    (slow DCN links), the inner axis across a host's chips (fast ICI), so
    jax.devices()' host-major ordering puts each row's chips on one host
    and every collective that can ride ICI does.  Rendering/training treat
    the two axes as one flattened data-parallel pixel axis (renders are
    mesh-shape-invariant); the axis split matters the moment a collective
    is mesh-aware — gradient psums reduce over ICI first, then DCN.

    Multi-host: call jax.distributed.initialize() first; then
    shape=(jax.process_count(), jax.local_device_count()).
    """
    if devices is None:
        devices = jax.devices()
    if shape is not None:
        hosts, chips = shape
        if n_devices is not None:
            raise ValueError("pass n_devices or shape, not both")
        if hosts * chips > len(devices):
            raise ValueError(f"mesh shape {shape} needs {hosts * chips} "
                             f"devices, have {len(devices)}")
        # jax.devices() order is NOT guaranteed host-major on multi-host
        # topologies; group by process first so every "ici" row stays on
        # one host and collectives ride ICI as designed (single-process
        # grids — all tests here — are unchanged by the stable grouping).
        by_proc: dict = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        ordered = [d for p in sorted(by_proc) for d in by_proc[p]]
        grid = np.asarray(ordered[:hosts * chips]).reshape(hosts, chips)
        if len(by_proc) > 1:
            for row in grid:
                procs = {d.process_index for d in row}
                if len(procs) != 1:
                    raise ValueError(
                        f"an 'ici' row spans processes {sorted(procs)}; "
                        f"use shape=(process_count, local_device_count) "
                        f"so each row maps to one host's chips")
        return Mesh(grid, ("dcn", "ici"))
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("rays",))


def mesh_axes(mesh: Mesh) -> tuple:
    """The mesh's data-parallel axis names as a flat tuple — P(mesh_axes(m))
    shards an array's leading dim over EVERY mesh axis (outer-major), which
    is the layout all render/train sharding here uses."""
    return tuple(mesh.axis_names)


def _padded_pixels(W, H, n_shards):
    WH = W * H
    per = -(-WH // n_shards)
    pix = np.minimum(np.arange(n_shards * per, dtype=np.int32), WH - 1)
    return pix, WH


@functools.partial(jax.jit,
                   static_argnames=("meta", "chunk", "differentiable"))
def _sharded_radiance(data: SceneData, cam: Camera, seed, pixel_ids, *,
                      meta: SceneMeta, chunk: int, differentiable: bool):
    return radiance_for_pixels(data, meta, cam, seed, pixel_ids,
                               chunk=chunk, differentiable=differentiable)


def render_sharded(data: SceneData, meta: SceneMeta, cam: Camera, mesh: Mesh,
                   seed=DEFAULT_SEED, chunk=512, differentiable=False):
    """Render with pixels sharded over ``mesh``; returns [H,W,3] on host.

    Scene/camera are replicated; the pixel id array (and thus every ray
    state tensor derived from it) is sharded along the 'rays' axis.
    """
    W, H = cam.image_width, cam.image_height
    n = mesh.devices.size
    pix, WH = _padded_pixels(W, H, n)

    shard = NamedSharding(mesh, P(mesh_axes(mesh)))
    repl = NamedSharding(mesh, P())
    pix_dev = jax.device_put(jnp.asarray(pix), shard)
    data_dev = jax.device_put(data, repl)
    cam_dev = jax.device_put(cam, repl)

    fb = _sharded_radiance(data_dev, cam_dev, jnp.uint32(seed), pix_dev,
                           meta=meta, chunk=chunk,
                           differentiable=differentiable)
    fb = np.array(fb)[:WH]
    fb[np.isnan(fb)] = 0.0
    return fb.reshape(H, W, 3)


# ---------------------------------------------------------------------------
# Differentiable sharded training step (scene-parameter optimisation)
# ---------------------------------------------------------------------------

def make_train_step(meta: SceneMeta, mesh: Mesh, chunk=512, use_pallas=None):
    """Build a jitted step: (data, cam, target_flat, pixel_ids, seed) ->
    (loss, grads) where grads is d(loss)/d(SceneData) — float leaves only —
    all-reduced over the mesh by XLA (psum inserted for the replicated
    scene operand).  On TPU the closest-hit runs through the Pallas kernel
    in both passes (its custom VJP keeps the backward off the
    bandwidth-bound XLA intersector)."""
    shard = NamedSharding(mesh, P(mesh_axes(mesh)))
    repl = NamedSharding(mesh, P())
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def loss_fn(diff_data, data, cam, target, pixel_ids, seed):
        d = _merge_diff(data, diff_data)
        img = radiance_for_pixels(d, meta, cam, seed, pixel_ids,
                                  chunk=chunk, differentiable=True,
                                  use_pallas=use_pallas)
        return jnp.mean((img - target) ** 2)

    @functools.partial(jax.jit, donate_argnums=())
    def step(diff_data, data, cam, target, pixel_ids, seed):
        loss, grads = jax.value_and_grad(loss_fn)(
            diff_data, data, cam, target, pixel_ids, seed)
        return loss, grads

    # Device placement of the step operands is cached across calls keyed on
    # the host objects' identities: a training loop calls run() thousands
    # of times with the same scene/camera/target, and re-uploading them
    # through device_put every step costs several host round-trips per
    # step on a tunneled TPU (measured ~2 s of a 2.3 s step wall while the
    # device itself was busy 0.28 s).  Steady-state training keeps its
    # operands resident on device; this cache is that, without changing
    # the run() signature.
    prep_cache = {}

    def _prep(data, cam, target_img, seed):
        # identity comparison against STRONGLY-HELD key objects: keying on
        # id() alone is unsound (a collected object's id can be reused by
        # the next perturbed copy — observed as stale device scenes under
        # finite-difference probing); holding the refs pins the ids
        key = prep_cache.get("key")
        hit = (key is not None and key[0] is data and key[1] is cam
               and key[2] is target_img)
        if not hit:
            W, H = cam.image_width, cam.image_height
            n = mesh.devices.size
            pix, WH = _padded_pixels(W, H, n)
            target = np.asarray(target_img, np.float32).reshape(-1, 3)
            target = np.concatenate(
                [target, np.repeat(target[-1:], len(pix) - WH, 0)], 0)
            pix_dev = jax.device_put(jnp.asarray(pix), shard)
            tgt_dev = jax.device_put(jnp.asarray(target), shard)
            data_dev = jax.device_put(data, repl)
            cam_dev = jax.device_put(cam, repl)
            diff = _extract_diff(data_dev)
            prep_cache.update(key=(data, cam, target_img),
                              val=(diff, data_dev, cam_dev,
                                            tgt_dev, pix_dev))
        diff, data_dev, cam_dev, tgt_dev, pix_dev = prep_cache["val"]
        return diff, data_dev, cam_dev, tgt_dev, pix_dev, jnp.uint32(seed)

    def run(data, cam, target_img, seed=DEFAULT_SEED):
        return step(*_prep(data, cam, target_img, seed))

    def lower_hlo(data, cam, target_img, seed=DEFAULT_SEED) -> str:
        """Compiled-HLO text of the step — for the collective audit
        (tests/test_sharding.py): the forward must carry zero inter-device
        collectives; the backward exactly the gradient psums."""
        return step.lower(*_prep(data, cam, target_img, seed)) \
            .compile().as_text()

    run.lower_hlo = lower_hlo
    return run


_DIFF_FIELDS = ("sph_center", "sph_cvec", "sph_radius", "quad_Q", "quad_u",
                "quad_v", "mat_albedo", "mat_fuzz", "mat_ior", "tex_color")


def _extract_diff(data: SceneData) -> dict:
    """The differentiable scene leaves (BASELINE gradient targets)."""
    return {f: getattr(data, f) for f in _DIFF_FIELDS}


def _merge_diff(data: SceneData, diff: dict) -> SceneData:
    return data.replace(**diff)
