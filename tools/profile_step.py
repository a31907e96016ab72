"""In-loop component costs for the scene-8 bounce step, measured as jitted
fori_loops of K iterations so per-dispatch overhead (~1.4 ms through the
TPU tunnel) amortizes away.

    python tools/profile_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

K = 32


def bench_loop(make_body, init, n=5):
    """Median wall time of one jitted K-iteration fori_loop call."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, make_body, c)

    out = run(init)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(out)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / K


def main():
    from mort_tpu.render import pallas_intersect as pal
    from mort_tpu.render import vec as v3
    from mort_tpu.render.intersect import T_MIN, media_pass, quad_frames
    from mort_tpu.render.hitshade import finalize_and_shade
    from mort_tpu.render.primtable import build_prim_table
    from mort_tpu.render.textures import texture_value
    from mort_tpu.scene import scenes as sc
    from mort_tpu.camera import derive_basis, get_rays_soa
    from mort_tpu.rng import uniform4

    world, cam = sc.build_scene(8)
    data, meta = world.compile()
    qf = quad_frames(data)
    table, mat_cols = build_prim_table(data, meta, qf)
    P = 1 << 17
    print(f"scene 8, pool {P}, loop K={K}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ro_r = jax.random.uniform(k1, (P, 3), minval=-800, maxval=800) \
        * jnp.array([1.0, 0.35, 1.0]) + jnp.array([0.0, 280.0, 0.0])
    rd_r = jax.random.normal(k2, (P, 3))
    tme0 = jax.random.uniform(k3, (P,))
    pix = jnp.arange(P, dtype=jnp.int32) % (800 * 800)
    samp = jnp.zeros(P, jnp.int32)
    seed = jnp.uint32(69420)
    basis = derive_basis(cam)

    ro0 = v3.V3.from_rows(ro_r)
    rd0 = v3.V3.from_rows(rd_r)

    def perturb(i, ro, rd):
        # rotate state slightly each iteration so the loop can't be hoisted
        s = jnp.float32(1.0) + jnp.float32(1e-6) * i.astype(jnp.float32)
        return ro * s, rd * s

    # 1. kernel only
    def body_k(i, c):
        ro, rd, acc = c
        ro, rd = perturb(i, ro, rd)
        bt, bk, bi, row = pal.closest_hit_pallas(data, meta, qf, table,
                                                 ro, rd, tme0)
        return ro, rd, acc + bt
    dt = bench_loop(body_k, (ro0, rd0, jnp.zeros(P)))
    print(f"kernel              : {dt*1e3:7.3f} ms/step", flush=True)

    # 2. kernel + media
    def body_km(i, c):
        ro, rd, acc = c
        ro, rd = perturb(i, ro, rd)
        bt, bk, bi, row = pal.closest_hit_pallas(data, meta, qf, table,
                                                 ro, rd, tme0)
        bt, bk, bi = media_pass(data, meta, qf, ro, rd, seed, pix, samp,
                                0, T_MIN, bt, bk, bi)
        return ro, rd, acc + bt
    dt = bench_loop(body_km, (ro0, rd0, jnp.zeros(P)))
    print(f"kernel+media        : {dt*1e3:7.3f} ms/step", flush=True)

    # 3. kernel + media + shade (the full per-bounce compute)
    def body_kms(i, c):
        ro, rd, acc = c
        ro, rd = perturb(i, ro, rd)
        bt, bk, bi, row = pal.closest_hit_pallas(data, meta, qf, table,
                                                 ro, rd, tme0)
        bt, bk, bi = media_pass(data, meta, qf, ro, rd, seed, pix, samp,
                                0, T_MIN, bt, bk, bi)
        out = finalize_and_shade(data, meta, qf, table, mat_cols, ro, rd,
                                 tme0, bt, bk, bi, seed, pix, samp, 0,
                                 row_t=row)
        return ro, rd, acc + out.weight.x
    dt = bench_loop(body_kms, (ro0, rd0, jnp.zeros(P)))
    print(f"kernel+media+shade  : {dt*1e3:7.3f} ms/step", flush=True)

    # 4. + camera respawn rays (as in bounce_step's in-window respawn)
    def body_all(i, c):
        ro, rd, acc = c
        ro, rd = perturb(i, ro, rd)
        bt, bk, bi, row = pal.closest_hit_pallas(data, meta, qf, table,
                                                 ro, rd, tme0)
        bt, bk, bi = media_pass(data, meta, qf, ro, rd, seed, pix, samp,
                                0, T_MIN, bt, bk, bi)
        out = finalize_and_shade(data, meta, qf, table, mat_cols, ro, rd,
                                 tme0, bt, bk, bi, seed, pix, samp, 0,
                                 row_t=row)
        ro_n, rd_n, t_n = get_rays_soa(cam, basis, seed, pix, samp)
        ro = v3.where(out.hit, out.p, ro_n)
        rd = v3.where(out.hit, out.new_dir, rd_n)
        return ro, rd, acc + t_n
    dt = bench_loop(body_all, (ro0, rd0, jnp.zeros(P)))
    print(f"+respawn rays       : {dt*1e3:7.3f} ms/step", flush=True)

    # 5. isolated: texture_value in-loop
    tid = jnp.zeros(P, jnp.int32)
    def body_tex(i, c):
        u, acc = c
        u = u + jnp.float32(1e-6)
        val = texture_value(data, meta, tid, u, u, ro_r)
        return u, acc + val[:, 0]
    dt = bench_loop(body_tex, (jnp.zeros(P), jnp.zeros(P)))
    print(f"texture_value       : {dt*1e3:7.3f} ms/step", flush=True)

    # 6. isolated: one philox block in-loop
    def body_rng(i, c):
        s, acc = c
        u = uniform4(seed, pix, s, 1, 3)[0]
        return s + 1, acc + u
    dt = bench_loop(body_rng, (samp, jnp.zeros(P)))
    print(f"uniform4 (1 block)  : {dt*1e3:7.3f} ms/step", flush=True)

    # 7. isolated: camera ray generation in-loop
    def body_cam(i, c):
        s, acc = c
        ro_n, rd_n, t_n = get_rays_soa(cam, basis, seed, pix, s)
        return s + 1, acc + t_n + ro_n.x + rd_n.x
    dt = bench_loop(body_cam, (samp, jnp.zeros(P)))
    print(f"get_rays_soa        : {dt*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
