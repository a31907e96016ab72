"""Sweep wavefront scheduling knobs (spt, window, span size) on the real
chip for the bench workloads, to pin the default policy by measurement.

    python tools/tune_wavefront.py [scene ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc

    scenes = [int(a) for a in sys.argv[1:]] or [8, 1]
    for idx in scenes:
        if idx == 1:
            world, cam = sc.random_spheres()
        else:
            world, cam = sc.build_scene(idx)
        data, meta = world.compile()
        # scaled: full geometry, reduced spp so one config ~ 30-60 s
        spp_full = cam.sqrt_spp ** 2
        sqrt_spp = min(cam.sqrt_spp, 7)
        cam_s = cam.replace(sqrt_spp=sqrt_spp)
        spp = sqrt_spp ** 2
        n_paths = cam_s.image_width * cam_s.image_height * spp
        print(f"scene {idx}: {cam_s.image_width}x{cam_s.image_height} @ {spp}"
              f"spp depth {cam_s.bounce_limit} ({n_paths/1e6:.0f}M paths)",
              flush=True)
        cfgs = [(16, 8, 200), (8, 8, 200), (4, 8, 200), (2, 8, 200),
                (4, 4, 200), (4, 8, 80), (4, 8, 400)]
        for spt, window, span_m in cfgs:
            kw = dict(spt=spt, window=window,
                      max_paths_per_call=span_m * 1_000_000)
            t0 = time.perf_counter()
            render_wavefront(data, meta, cam_s, seed=1, **kw) \
                .block_until_ready()
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            img, st = render_wavefront(data, meta, cam_s, seed=2,
                                       return_stats=True, **kw)
            img.block_until_ready()
            dt = time.perf_counter() - t0
            occ = st["useful_segments"] / max(st["slots_executed"], 1)
            print(f"  spt={spt:2d} w={window} span={span_m:3d}M: {dt:7.3f}s "
                  f"{n_paths/dt/1e6:6.2f}M paths/s occ {occ:.3f} "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
