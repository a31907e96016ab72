"""Structured metrics, timing, and profiling.

The reference's observability is a single printf of average frame time
(mort.cu:110-119) plus a never-used device printf macro (SOME_THREAD_ONLY,
world.cuh:12).  The rebuild provides structured per-render metrics
(paths/s, rays-in-flight estimates, wall/compile split) as JSON lines, and
wraps jax.profiler for TPU trace capture (SURVEY.md section 5, tracing row).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time

import jax


class FrameTimer:
    """Running average frame timer, printf-compatible with mort.cu:119."""

    def __init__(self, log=sys.stderr):
        self.total = 0.0
        self.frames = 0
        self.log = log

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.total += time.perf_counter() - t0
        self.frames += 1

    @property
    def avg_ms(self):
        return 1000.0 * self.total / max(1, self.frames)

    def print_avg(self):
        print(f"Avg. time per frame: {self.avg_ms:.1f} ms", file=self.log)


def render_metrics(cam, meta, wall_s, compile_s=None, avg_path_len=None):
    """One JSON-ready dict of render throughput metrics."""
    n_paths = cam.image_width * cam.image_height * cam.sqrt_spp ** 2
    m = {
        "width": cam.image_width,
        "height": cam.image_height,
        "spp": cam.sqrt_spp ** 2,
        "bounce_limit": cam.bounce_limit,
        "n_spheres": meta.n_spheres,
        "n_quads": meta.n_quads,
        "n_media": len(meta.media),
        "paths": n_paths,
        "wall_s": round(wall_s, 4),
        "paths_per_s": round(n_paths / wall_s, 1),
    }
    if compile_s is not None:
        m["compile_s"] = round(compile_s, 2)
    if avg_path_len is not None:
        m["avg_path_len"] = round(avg_path_len, 3)
        m["ray_segments_per_s"] = round(n_paths * avg_path_len / wall_s, 1)
    return m


def log_metrics(m, log=sys.stderr):
    print(json.dumps(m), file=log)


@contextlib.contextmanager
def trace(dir="/tmp/mort_tpu_trace"):
    """jax.profiler trace capture around a block (view in XProf/TensorBoard)."""
    jax.profiler.start_trace(dir)
    try:
        yield dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
