"""Benchmark harness: Scene 1 throughput vs the reference RTX-2080 anchor.

The reference's only published number: Scene 1 (random_spheres, 1200x675 at
100 effective spp, bounce_limit 20, ~490 spheres + BVH) renders in ~16 s on
an RTX 2080 (reference README.md:11; geometry pinned from mort.cu:210-213,
camera.cuh:48-52 — BASELINE.json's "1200x800" is corrected to the code-true
1200x675, see BASELINE.md).  Derived: 5.0625 M camera paths/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline > 1 means faster than the RTX-2080 anchor per chip.
Timing excludes compilation (the reference prints steady-state per-frame
kernel time, mort.cu:110-119).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_PATHS_PER_S = 1200 * 675 * 100 / 16.0   # RTX 2080 anchor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced geometry/spp for a fast smoke run")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", type=int, default=1)
    args = ap.parse_args()

    from mort_tpu.render.wavefront import render_wavefront as render_fn
    from mort_tpu.scene import scenes as sc

    if args.scene == 1:
        world, cam = sc.random_spheres(quick=args.quick)
    else:
        world, cam = sc.build_scene(args.scene)
    data, meta = world.compile()
    if args.quick:
        cam = cam.replace(image_width=300, image_height=168, sqrt_spp=3,
                          bounce_limit=8)

    print(f"bench scene {args.scene}: {cam.image_width}x{cam.image_height} "
          f"@ {cam.sqrt_spp**2}spp depth {cam.bounce_limit}, "
          f"{meta.n_spheres} spheres {meta.n_quads} quads", file=sys.stderr)

    # compile + warmup (wavefront renderer: the TPU fast path; splits the
    # task space into bounded device executions, so it is also what long
    # tunneled-TPU sessions must use)
    t0 = time.perf_counter()
    render_fn(data, meta, cam, seed=69420).block_until_ready()
    print(f"compile+first render: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        render_fn(data, meta, cam, seed=69420 + i).block_until_ready()
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]   # median

    n_paths = cam.image_width * cam.image_height * cam.sqrt_spp ** 2
    paths_per_s = n_paths / wall
    print(f"steady-state: {wall:.3f}s for {n_paths/1e6:.1f}M paths", file=sys.stderr)

    print(json.dumps({
        "metric": "scene1_paths_per_s" if args.scene == 1 else f"scene{args.scene}_paths_per_s",
        "value": round(paths_per_s, 1),
        "unit": "paths/s/chip",
        "vs_baseline": round(paths_per_s / BASELINE_PATHS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
