"""Per-pass timing breakdown of the wavefront bounce step on the TPU."""
import time, functools
import jax, jax.numpy as jnp
from mort_tpu.scene import scenes as sc
from mort_tpu.camera import derive_basis, get_rays_soa
from mort_tpu.render.intersect import quad_frames, T_MIN
from mort_tpu.render.primtable import build_prim_table
from mort_tpu.render import pallas_intersect as pal
from mort_tpu.render.hitshade import finalize_and_shade
from mort_tpu.render.vec import V3

world, cam = sc.random_spheres()
data, meta = world.compile()
qf = quad_frames(data)
table, mat_cols = build_prim_table(data, meta, qf)
P = 1 << 18
key = jax.random.PRNGKey(0)
basis = derive_basis(cam)
pixel = jax.random.randint(key, (P,), 0, cam.image_width * cam.image_height, jnp.int32)
sample = jnp.zeros(P, jnp.int32)
seed = jnp.uint32(69420)
ro, rd, tme = get_rays_soa(cam, basis, seed, pixel, sample)
bounce = jnp.zeros(P, jnp.int32)

REP = 20

@jax.jit
def hit_only(ro, rd, tme):
    def step(c, _):
        ro, rd, tme = c
        bt, bk, bi, row_t = pal.closest_hit_pallas(data, meta, qf, table, ro, rd, tme)
        # feed outputs back so nothing is DCE'd
        ro2 = V3(ro.x + bt * 0, ro.y, ro.z)
        return (ro2, rd, tme + bk * 0.0), None
    c, _ = jax.lax.scan(step, (ro, rd, tme), None, length=REP)
    return c[0].x

@jax.jit
def full_step(ro, rd, tme):
    def step(c, _):
        ro, rd, tme = c
        bt, bk, bi, row_t = pal.closest_hit_pallas(data, meta, qf, table, ro, rd, tme)
        out = finalize_and_shade(data, meta, qf, table, mat_cols, ro, rd,
                                 tme, bt, bk, bi, seed, pixel, sample,
                                 bounce, row_t=row_t)
        return (out.p, out.new_dir, tme), None
    c, _ = jax.lax.scan(step, (ro, rd, tme), None, length=REP)
    return c[0].x

@jax.jit
def rays_only(pixel, sample):
    def step(c, _):
        pixel, sample = c
        ro, rd, t = get_rays_soa(cam, basis, seed, pixel, sample)
        return (pixel + (ro.x > 0), sample), None
    c, _ = jax.lax.scan(step, (pixel, sample), None, length=REP)
    return c[0]

def bench(name, f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / (3 * REP)
    print(f"{name:12s} {dt*1e3:8.3f} ms/step  {P/dt/1e6:8.1f} M rays/s")
    return dt

t_hit = bench("hit", hit_only, ro, rd, tme)
t_full = bench("hit+shade", full_step, ro, rd, tme)
t_rays = bench("get_rays", rays_only, pixel, sample)
print(f"shade alone ~ {(t_full-t_hit)*1e3:.3f} ms")
