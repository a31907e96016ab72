"""Benchmark harness: reference workloads vs the RTX-2080 anchor.

The reference's only published number: Scene 1 (random_spheres, 1200x675 at
100 effective spp, bounce_limit 20, ~490 spheres + BVH) renders in ~16 s on
an RTX 2080 (reference README.md:11; geometry pinned from mort.cu:210-213,
camera.cuh:48-52 — BASELINE.json's "1200x800" is corrected to the code-true
1200x675, see BASELINE.md).  Derived: 5.0625 M camera paths/s.

Default mode prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline > 1 means faster than the RTX-2080 anchor per chip.
Timing excludes compilation (the reference prints steady-state per-frame
kernel time, mort.cu:110-119); compilation is excluded by a tiny-span
warmup render that reuses the same jitted span function.

``--all`` additionally benches the reference's heavy workloads at their
code-true geometry — cornell_box 600^2 @ 961 eff. spp depth 50
(mort.cu:442-448), cornell_smoke 800^2 @ 1936 eff. spp depth 50
(mort.cu:491-504), final_scene 800^2 @ 961 eff. spp depth 40
(mort.cu:678-680) — and writes one record per scene (paths/s,
ray-segments/s, lane occupancy) to BENCH_SCENES.json, still ending with
the single scene-1 driver line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_PATHS_PER_S = 1200 * 675 * 100 / 16.0   # RTX 2080 anchor

# Per-device-execution path budget: heavy scenes split into spans so single
# launches stay under the tunneled-TPU watchdog while the wavefront's
# end-of-span straggler tail still amortizes (tools/tune_wavefront.py).
SPAN_PATHS = {1: 200_000_000, 6: 80_000_000, 7: 80_000_000, 8: 80_000_000}


def _bench_scene(idx, frames, quick, span_paths=None):
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    if idx == 1:
        world, cam = sc.random_spheres(quick=quick)
    else:
        world, cam = sc.build_scene(idx)
    data, meta = world.compile()
    if quick:
        cam = cam.replace(image_width=300, image_height=168, sqrt_spp=3,
                          bounce_limit=8)
    spp = cam.sqrt_spp ** 2
    n_paths = cam.image_width * cam.image_height * spp
    if span_paths is None:
        span_paths = SPAN_PATHS.get(idx, 40_000_000)

    print(f"bench scene {idx}: {cam.image_width}x{cam.image_height} "
          f"@ {spp}spp depth {cam.bounce_limit}, "
          f"{meta.n_spheres} spheres {meta.n_quads} quads "
          f"({n_paths/1e6:.0f}M paths/frame)", file=sys.stderr)

    kw = dict(max_paths_per_call=span_paths)

    # compile via a tiny span (same static shapes as the full frames)
    t0 = time.perf_counter()
    render_wavefront(data, meta, cam, seed=69420,
                     task_range=(0, 4096), **kw).block_until_ready()
    compile_s = time.perf_counter() - t0
    print(f"  compile+warmup span: {compile_s:.1f}s", file=sys.stderr)

    times, stats = [], None
    for i in range(frames):
        t0 = time.perf_counter()
        img, stats = render_wavefront(data, meta, cam, seed=69420 + i,
                                      return_stats=True, **kw)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
        print(f"  frame {i}: {times[-1]:.3f}s", file=sys.stderr)
    wall = sorted(times)[len(times) // 2]   # median

    rec = {
        "scene": idx,
        "width": cam.image_width, "height": cam.image_height,
        "spp": spp, "depth": cam.bounce_limit,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "frames": frames,
        "paths_per_s": round(n_paths / wall, 1),
        "vs_baseline": round(n_paths / wall / BASELINE_PATHS_PER_S, 4),
    }
    if stats:
        segs = stats["useful_segments"]
        rec["ray_segments_per_s"] = round(segs / wall, 1)
        rec["avg_path_len"] = round(segs / n_paths, 3)
        rec["lane_occupancy"] = round(segs / max(stats["slots_executed"], 1), 4)
    print(f"  -> {rec['paths_per_s']/1e6:.1f}M paths/s, "
          f"{rec.get('ray_segments_per_s', 0)/1e6:.0f}M segs/s, "
          f"occupancy {rec.get('lane_occupancy', 0):.2f}", file=sys.stderr)
    return rec


def _bench_grad_step(quick):
    """Gradient-path throughput: one sharded train step (forward + backward
    + grad psum over the 1-chip mesh) on scene 1 at a scaled config — the
    lockstep differentiable integrator with the kernel's custom VJP.
    Reported as grad-step camera paths/s next to the forward number
    (BASELINE config: gradient allreduce path)."""
    from mort_tpu.parallel.sharding import make_mesh, make_train_step
    from mort_tpu.scene import scenes as sc
    import numpy as np

    world, cam = sc.random_spheres(quick=quick)
    data, meta = world.compile()
    # scaled config: training steps run many small iterations, not full spp
    cam = cam.replace(image_width=600 if not quick else 160,
                      image_height=338 if not quick else 90,
                      sqrt_spp=2, bounce_limit=8)
    spp = cam.sqrt_spp ** 2
    n_paths = cam.image_width * cam.image_height * spp
    step = make_train_step(meta, make_mesh(1))
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)

    t0 = time.perf_counter()
    loss, grads = step(data, cam, target, seed=69420)
    import jax
    jax.block_until_ready((loss, grads))
    compile_s = time.perf_counter() - t0
    times = []
    # seeds must DIFFER from the warmup call's (an identical call can be
    # served from cache by the tunneled runtime), and the loss value is
    # materialized inside the timed region — block_until_ready alone was
    # observed to return before the remote execution finished
    for i in range(3):
        t0 = time.perf_counter()
        loss, grads = step(data, cam, target, seed=69421 + i)
        float(loss)
        jax.block_until_ready(grads)
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]
    rec = {
        "scene": 1, "mode": "grad_step",
        "width": cam.image_width, "height": cam.image_height,
        "spp": spp, "depth": cam.bounce_limit,
        "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
        "grad_paths_per_s": round(n_paths / wall, 1),
        "loss": float(loss),
    }
    print(f"  grad step: {wall:.3f}s -> {rec['grad_paths_per_s']/1e6:.2f}M "
          f"paths/s (fwd+bwd+psum)", file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced geometry/spp for a fast smoke run")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", type=int, default=1)
    ap.add_argument("--all", action="store_true",
                    help="bench every reference scene (1-10) + the "
                         "gradient step; write BENCH_SCENES.json")
    ap.add_argument("--grad", action="store_true",
                    help="bench only the gradient train step")
    ap.add_argument("--span-paths", type=int, default=None,
                    help="max camera paths per device execution")
    args = ap.parse_args()

    if args.grad:
        rec = _bench_grad_step(args.quick)
        print(json.dumps({
            "metric": "scene1_grad_paths_per_s",
            "value": rec["grad_paths_per_s"],
            "unit": "paths/s/chip",
            "vs_baseline": round(rec["grad_paths_per_s"]
                                 / BASELINE_PATHS_PER_S, 4),
        }))
        return

    if args.all:
        recs = []
        # every reference scene at code-true geometry: the four heavy
        # headline workloads (1/6/7/8) plus the light ones (2/3/4/5/9/10 —
        # seconds each) so each scene has a throughput artifact
        for idx, frames in ((1, args.frames), (2, 2), (3, 2), (4, 2),
                            (5, 2), (6, 2), (7, 2), (8, 2), (9, 2),
                            (10, 2)):
            recs.append(_bench_scene(idx, frames, args.quick,
                                     span_paths=args.span_paths))
        recs.append(_bench_grad_step(args.quick))
        with open("BENCH_SCENES.json", "w") as f:
            json.dump(recs, f, indent=1)
        print("wrote BENCH_SCENES.json", file=sys.stderr)
        rec = recs[0]
    else:
        rec = _bench_scene(args.scene, args.frames, args.quick,
                           span_paths=args.span_paths)
        if args.scene == 1:
            # gradient-path number rides along in the default driver run
            # (BASELINE config: forward + backward + grad psum)
            try:
                g = _bench_grad_step(quick=True)
                print(f"  grad step (quick): "
                      f"{g['grad_paths_per_s']/1e6:.2f}M paths/s "
                      f"(fwd+bwd+psum, compile {g['compile_s']}s)",
                      file=sys.stderr)
            except Exception as e:                      # noqa: BLE001
                print(f"  grad step bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"scene{rec['scene']}_paths_per_s",
        "value": rec["paths_per_s"],
        "unit": "paths/s/chip",
        "vs_baseline": rec["vs_baseline"],
    }))


if __name__ == "__main__":
    main()
