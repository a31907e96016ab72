"""BASELINE config #5, scaled: full-feature scene (final_scene), sharded
wavefront forward at 1920x1080 rendered in checkpointed layers, then a
sharded train step (forward + backward + scene-grad psum) on the same
scene.  (BASELINE.json north star: "1920x1080 @ 1000spp, multi-host,
gradient allreduce, checkpointed accumulation".)

Two modes:

    python tools/config5.py --mesh    # virtual 8-device CPU mesh (the
                                      # multi-chip shape; tiny spp)
    python tools/config5.py           # real single chip, full 1920x1080
                                      # forward + grad step; writes
                                      # CONFIG5.json at the repo root

The mesh mode asserts bit-identical resume across an interrupt and mesh
size change (8 -> 2 devices), i.e. the elastic checkpointed accumulation
of the production config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_mesh():
    import jax
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from mort_tpu.parallel.sharding import make_mesh, make_train_step
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    world, cam = sc.final_scene(quick=True)
    data, meta = world.compile()
    cam = cam.replace(image_width=192, image_height=108, sqrt_spp=2,
                      bounce_limit=8)
    mesh8, mesh2 = make_mesh(8), make_mesh(2)

    # layer-checkpointed accumulation, interrupted and resumed on a
    # different mesh size (the multi-host elastic path)
    t0 = time.perf_counter()
    part = np.asarray(render_wavefront(data, meta, cam, seed=7, mesh=mesh8,
                                       layer_range=(0, 1), scrub_nan=False))
    img = np.asarray(render_wavefront(data, meta, cam, seed=7, mesh=mesh2,
                                      fb=part, layer_range=(1, 1)))
    whole = np.asarray(render_wavefront(data, meta, cam, seed=7, mesh=mesh8))
    assert np.array_equal(img, whole), "elastic resume not bit-identical"
    fwd_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    step = make_train_step(meta, mesh8)
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)
    loss, grads = step(data, cam, target, seed=7)
    jax.block_until_ready((loss, grads))
    n_leaves = len(jax.tree.leaves(grads))
    gmax = max(float(np.abs(np.asarray(g)).max())
               for g in jax.tree.leaves(grads))
    assert np.isfinite(float(loss)) and np.isfinite(gmax)
    grad_s = time.perf_counter() - t0
    print(f"mesh mode ok: {cam.image_width}x{cam.image_height} sharded "
          f"forward+elastic resume {fwd_s:.1f}s; train step on 8-mesh "
          f"{grad_s:.1f}s (loss {float(loss):.4g}, {n_leaves} grad leaves, "
          f"max|g| {gmax:.3g})")


def run_chip():
    import jax
    import numpy as np
    from mort_tpu.parallel.sharding import make_mesh, make_train_step
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    world, cam = sc.final_scene()
    data, meta = world.compile()
    # full config-5 raster; spp scaled so one run fits the bench budget —
    # per-path cost is spp-independent (same kernels, same lane pool)
    spp = 16
    cam = cam.replace(image_width=1920, image_height=1080,
                      sqrt_spp=int(np.sqrt(spp)))
    n_paths = 1920 * 1080 * spp

    t0 = time.perf_counter()
    render_wavefront(data, meta, cam, seed=7,
                     max_paths_per_call=80_000_000).block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    img, st = render_wavefront(data, meta, cam, seed=8,
                               max_paths_per_call=80_000_000,
                               return_stats=True)
    img.block_until_ready()
    fwd_s = time.perf_counter() - t0
    st = dict(st)
    st.pop("per_shard_useful", None)

    # sharded train step (1-chip mesh): fwd+bwd+psum at a training-scale
    # sub-raster of the same scene
    cam_g = cam.replace(image_width=480, image_height=270, sqrt_spp=2,
                        bounce_limit=8)
    step = make_train_step(meta, make_mesh(1))
    target = np.zeros((cam_g.image_height, cam_g.image_width, 3), np.float32)
    t0 = time.perf_counter()
    loss, grads = step(data, cam_g, target, seed=7)
    jax.block_until_ready((loss, grads))
    gcompile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    loss, grads = step(data, cam_g, target, seed=8)
    jax.block_until_ready((loss, grads))
    grad_s = time.perf_counter() - t0
    g_paths = cam_g.image_width * cam_g.image_height * 4

    rec = {
        "config": "BASELINE #5 (final_scene, 1920x1080, wavefront fwd + "
                  "sharded grad step), spp scaled to fit bench budget",
        "width": 1920, "height": 1080, "spp": spp,
        "depth": cam.bounce_limit,
        "forward_wall_s": round(fwd_s, 2),
        "forward_compile_s": round(compile_s, 1),
        "forward_paths_per_s": round(n_paths / fwd_s, 1),
        "lane_occupancy": round(st["useful_segments"]
                                / max(st["slots_executed"], 1), 4),
        "grad_step_wall_s": round(grad_s, 3),
        "grad_step_compile_s": round(gcompile_s, 1),
        "grad_paths_per_s": round(g_paths / grad_s, 1),
        "grad_loss": float(loss),
        "image_finite": bool(np.isfinite(np.asarray(img)).all()),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "CONFIG5.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        run_mesh()
    else:
        run_chip()
