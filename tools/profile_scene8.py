"""Component-level profile of the scene-8 (final_scene) render loop on TPU.

Times each piece of the per-bounce work in isolation over a pool-sized ray
batch, then a few whole-span configurations, to locate where the remaining
wall-clock goes.  Run on the TPU host:

    python tools/profile_scene8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warm=3, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from mort_tpu.render import pallas_intersect as pal
    from mort_tpu.render import vec as v3
    from mort_tpu.render.intersect import T_MIN, media_pass, quad_frames
    from mort_tpu.render.hitshade import finalize_and_shade
    from mort_tpu.render.primtable import build_prim_table
    from mort_tpu.render.textures import texture_value
    from mort_tpu.render.wavefront import render_wavefront
    from mort_tpu.scene import scenes as sc
    from mort_tpu.rng import uniform4

    world, cam = sc.build_scene(8)
    data, meta = world.compile()
    qf = quad_frames(data)
    table, mat_cols = build_prim_table(data, meta, qf)
    P = 1 << 17
    print(f"scene 8: {meta.n_spheres} spheres, {meta.n_quads} quads, "
          f"{len(meta.media)} media; pool {P}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # rays roughly inside the scene bbox, random directions (incoherent,
    # like a bounced pool)
    ro_r = jax.random.uniform(k1, (P, 3), minval=-800, maxval=800) \
        * jnp.array([1.0, 0.35, 1.0]) + jnp.array([0.0, 280.0, 0.0])
    rd_r = jax.random.normal(k2, (P, 3))
    tme = jax.random.uniform(k3, (P,))
    ro = v3.V3.from_rows(ro_r)
    rd = v3.V3.from_rows(rd_r)
    pix = jnp.arange(P, dtype=jnp.int32) % (800 * 800)
    samp = jnp.zeros(P, jnp.int32)
    seed = jnp.uint32(69420)

    # --- kernel alone, accel variants ---
    for accel in ("none", "cull", "bvh"):
        f = jax.jit(lambda ro, rd, tme, a=accel: pal.closest_hit_pallas(
            data, meta, qf, table, ro, rd, tme, accel=a)[0])
        dt = timeit(f, ro, rd, tme)
        print(f"kernel accel={accel:4s}: {dt*1e3:8.2f} ms "
              f"({P/dt/1e6:.0f}M rays/s)")

    # --- media pass alone ---
    bt = jnp.full(P, jnp.inf)
    bk = jnp.zeros(P, jnp.int32)
    bi = jnp.zeros(P, jnp.int32)
    f = jax.jit(lambda ro, rd: media_pass(data, meta, qf, ro, rd, seed,
                                          pix, samp, 0, T_MIN, bt, bk, bi))
    dt = timeit(f, ro, rd)
    print(f"media_pass          : {dt*1e3:8.2f} ms")

    # --- shade alone (on kernel output) ---
    kern = jax.jit(lambda ro, rd, tme: pal.closest_hit_pallas(
        data, meta, qf, table, ro, rd, tme, accel="none"))
    btk, bkk, bik, rowt = kern(ro, rd, tme)
    f = jax.jit(lambda ro, rd, tme, btk, bkk, bik, rowt: finalize_and_shade(
        data, meta, qf, table, mat_cols, ro, rd, tme, btk, bkk, bik,
        seed, pix, samp, 0, row_t=rowt))
    dt = timeit(f, ro, rd, tme, btk, bkk, bik, rowt)
    print(f"finalize_and_shade  : {dt*1e3:8.2f} ms")

    # --- texture_value alone (fallback texture path over full pool) ---
    tid = jnp.zeros(P, jnp.int32)
    uu = jnp.abs(jnp.sin(tme))
    f = jax.jit(lambda uu, p: texture_value(data, meta, tid, uu, uu, p))
    dt = timeit(f, uu, ro_r)
    print(f"texture_value       : {dt*1e3:8.2f} ms")

    # --- RNG block ---
    f = jax.jit(lambda s: uniform4(seed, pix, s, 1, 3))
    dt = timeit(f, samp)
    print(f"uniform4 (1 block)  : {dt*1e3:8.2f} ms")

    # --- whole spans: spt x window grid at small spp ---
    cam_s = cam.replace(image_width=800, image_height=800, sqrt_spp=4,
                        bounce_limit=40)
    n_paths = 800 * 800 * 16
    for spt, window in ((16, 8), (16, 4), (8, 4), (8, 8), (4, 4), (16, 2)):
        t0 = time.perf_counter()
        render_wavefront(data, meta, cam_s, seed=1, spt=spt, window=window,
                         max_paths_per_call=80_000_000).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        img, st = render_wavefront(data, meta, cam_s, seed=2, spt=spt,
                                   window=window,
                                   max_paths_per_call=80_000_000,
                                   return_stats=True)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        occ = st["useful_segments"] / max(st["slots_executed"], 1)
        print(f"span spt={spt:2d} window={window}: {dt:7.3f} s "
              f"({n_paths/dt/1e6:5.2f}M paths/s, occ {occ:.3f}, "
              f"compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
