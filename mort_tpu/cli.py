"""Command-line interface.

The reference takes a single positional scene number 1-10 and opens an
interactive GL window (mort.cu:633-744).  The TPU CLI renders to PNG/NPZ
headlessly and exposes the per-scene camera knobs as flags:

    python -m mort_tpu.cli render 6 --width 200 --spp 64 --out cornell.png
    python -m mort_tpu.cli bench 1 --frames 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p):
    p.add_argument("scene", type=int, help="scene number 1-10 (mort.cu:649-689)")
    p.add_argument("--width", type=int, default=None, help="override image width")
    p.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    p.add_argument("--depth", type=int, default=None, help="override bounce limit")
    p.add_argument("--seed", type=int, default=None, help="RNG seed (default 69420)")
    p.add_argument("--quick", action="store_true",
                   help="reduced primitive counts for scenes 1/8/9")


def _build(args):
    import dataclasses

    from .camera import make_camera
    from .scene import scenes as sc

    if args.quick and args.scene in (1, 8, 9):
        if args.scene == 1:
            world, cam = sc.random_spheres(quick=True)
        else:
            wpix = 400 if args.scene == 9 else 800
            spp = 250 if args.scene == 9 else 1000
            depth = 4 if args.scene == 9 else 40
            world, cam = sc.final_scene(wpix, spp, depth, quick=True)
    else:
        world, cam = sc.build_scene(args.scene)

    overrides = {}
    if args.width is not None:
        overrides["image_width"] = args.width
        overrides["image_height"] = max(1, int(args.width * cam.image_height / cam.image_width))
    if args.spp is not None:
        import math
        overrides["sqrt_spp"] = max(1, int(math.sqrt(args.spp)))
    if args.depth is not None:
        overrides["bounce_limit"] = args.depth
    if overrides:
        cam = cam.replace(**overrides)
    data, meta = world.compile()
    return data, meta, cam


def cmd_render(args):
    from .io.image import save_npz, save_png
    from .render.wavefront import render_wavefront as render
    from .rng import DEFAULT_SEED

    data, meta, cam = _build(args)
    seed = DEFAULT_SEED if args.seed is None else args.seed
    print(f"scene {args.scene}: {cam.image_width}x{cam.image_height} "
          f"@ {cam.sqrt_spp ** 2}spp depth {cam.bounce_limit} "
          f"({meta.n_spheres} spheres, {meta.n_quads} quads, "
          f"{len(meta.media)} media, {len(meta.lights)} lights)", file=sys.stderr)
    t0 = time.perf_counter()
    img = render(data, meta, cam, seed=seed)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    n_paths = cam.image_width * cam.image_height * cam.sqrt_spp ** 2
    print(f"rendered in {dt:.2f}s ({n_paths / dt / 1e6:.2f} Mpaths/s, "
          f"incl. compile)", file=sys.stderr)
    out = args.out or f"scene{args.scene}.png"
    if out.endswith(".npz"):
        save_npz(out, img)
    else:
        save_png(out, img)
    print(out)


def cmd_bench(args):
    from .render.wavefront import render_wavefront as render
    from .rng import DEFAULT_SEED

    data, meta, cam = _build(args)
    seed = DEFAULT_SEED if args.seed is None else args.seed
    # warmup/compile
    render(data, meta, cam, seed=seed).block_until_ready()
    times = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        render(data, meta, cam, seed=seed + i).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_paths = cam.image_width * cam.image_height * cam.sqrt_spp ** 2
    print(json.dumps({
        "scene": args.scene,
        "width": cam.image_width, "height": cam.image_height,
        "spp": cam.sqrt_spp ** 2, "depth": cam.bounce_limit,
        "wall_s": dt, "paths_per_s": n_paths / dt,
    }))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mort-tpu",
                                 description="TPU-native differentiable path tracer")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a scene to PNG/NPZ")
    _add_common(pr)
    pr.add_argument("--out", default=None, help="output path (.png or .npz)")

    pb = sub.add_parser("bench", help="time repeated renders of a scene")
    _add_common(pb)
    pb.add_argument("--frames", type=int, default=3)

    args = ap.parse_args(argv)
    try:
        if args.cmd == "render":
            cmd_render(args)
        elif args.cmd == "bench":
            cmd_bench(args)
    except ValueError as e:
        ap.error(str(e))


if __name__ == "__main__":
    main()
