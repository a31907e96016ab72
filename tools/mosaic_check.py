"""Mosaic bit-exactness check for the limb-packed MXU numerics.

The CPU test suite deliberately validates the kernel's LOGIC at plain f32
(interpret mode) because XLA's simplifier can algebraically delete the
``x - f32(bf16(x))`` limb pattern when the interpret-inlined kernel lands
inside a large fused graph (pallas_intersect._coef_dot docstring).  The
limb numerics the chip actually runs are therefore pinned HERE, on real
hardware, as a runnable artifact (MOSAIC_CHECK.json) the driver can
re-execute every round:

1. **Limb-packed coefficient dot** (_limb_pack_rows + _ray_basis_packed +
   one native bf16 MXU pass) compiled through a real ``pl.pallas_call``:
   must reproduce the f64 coefficient products to < 2^-20 relative of the
   row/column magnitude product — the same bound the eager algebra test
   (tests/test_pallas_kernel.py::test_limb_packed_dot_algebra) enforces,
   now verified through the actual Mosaic compilation.

2. **One-hot row gather** (_gather3: 3 bf16 limb passes over the joined
   table): the shading rows the real kernel emits for hit lanes must be
   BIT-exact equal to the joined table rows — the gather is exact by
   construction (0/1 one-hot is exactly bf16; 3 table limbs cover all 24
   mantissa bits), and this verifies Mosaic preserves it.

    python tools/mosaic_check.py          # on the TPU host

Matches the precision contract documented in DEVIATIONS.md section 6.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    backend = jax.default_backend()
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "MOSAIC_CHECK.json")
    if backend != "tpu":
        with open(out_path, "w") as f:
            json.dump({"ok": False, "skipped": True, "backend": backend,
                       "reason": "requires the real TPU backend"}, f,
                      indent=1)
        print(f"skipped (backend={backend})")
        return 1

    from mort_tpu.render import pallas_intersect as pal

    # --- 1. limb-packed dot through a real Mosaic kernel ------------------
    rng = np.random.RandomState(11)
    rows, K = 64, pal.K_LIN
    tbl = np.zeros((rows, K), np.float32)
    # coefficient magnitudes spanning the scene-1 regime (|c| ~ 1e3,
    # |c^2 - r^2| ~ 1e6) plus O(1) terms — same distribution as the eager
    # algebra test so the bound is comparable
    tbl[:, :pal.K_LIVE] = (rng.randn(rows, pal.K_LIVE)
                           * np.power(10.0, rng.uniform(-1, 6, (rows, 1)))
                           ).astype(np.float32)
    rays = np.zeros((8, pal.TR), np.float32)
    rays[:3] = rng.uniform(-60, 60, (3, pal.TR))
    d = rng.randn(3, pal.TR)
    rays[3:6] = d / np.linalg.norm(d, axis=0)
    rays[6] = rng.rand(pal.TR)

    def kernel(coef_ref, rays_ref, out_ref):
        B = pal._ray_basis_packed(rays_ref[:])
        out_ref[:, :] = pal._dotp(pal._limb_pack_rows(coef_ref[:]), B)

    got = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, pal.TR), jnp.float32),
    )(jnp.asarray(tbl), jnp.asarray(rays))
    got = np.asarray(got, np.float64)

    basis64 = np.asarray(pal._ray_basis(jnp.asarray(rays)), np.float64)
    ref = np.asarray(tbl, np.float64) @ basis64
    scale = np.maximum(
        np.abs(np.asarray(tbl, np.float64)).max(axis=1, keepdims=True)
        * np.abs(basis64).max(axis=0), 1e-30)
    rel = float((np.abs(got - ref) / scale).max())
    ok_dot = rel < 2.0 ** -20

    # --- 2. one-hot row gather bit-exactness through the real kernel ------
    from mort_tpu import World
    from mort_tpu.render.intersect import K_QUAD, quad_frames
    from mort_tpu.render.primtable import build_prim_table

    w = World()
    m = w.lambertian(w.solid_color([0.5, 0.5, 0.5]))
    for i in range(9):
        c = rng.randn(3) * 3
        if i % 2:
            w.sphere(c, 0.3 + rng.rand(), m, center2=c + rng.randn(3) * 0.5)
        else:
            w.sphere(c, 0.3 + rng.rand(), m)
    for _ in range(5):
        w.quad(rng.randn(3) * 3, rng.randn(3) * 2, rng.randn(3) * 2, m)
    data, meta = w.compile()
    qf = quad_frames(data)
    table, _ = build_prim_table(data, meta, qf)
    n = 512
    ro = jnp.asarray(rng.randn(n, 3) * 6, jnp.float32)
    rd = jnp.asarray(rng.randn(n, 3), jnp.float32)
    tme = jnp.asarray(rng.rand(n), jnp.float32)

    gather_results = {}
    for accel in ("none", "cull", "bvh"):
        bt, bk, bi, prow = pal.closest_hit_pallas(
            data, meta, qf, table, ro, rd, tme, accel=accel)
        bt, bk, bi = map(np.asarray, (bt, bk, bi))
        hit = np.isfinite(bt)
        ns = data.sph_center.shape[0]
        g = np.where(bk == K_QUAD, bi + ns, bi)
        want = np.asarray(table)[np.clip(g, 0, table.shape[0] - 1)]
        got_rows = np.asarray(prow).T[:, :table.shape[1]]
        bitexact = bool(np.array_equal(got_rows[hit], want[hit]))
        gather_results[accel] = {"hits": int(hit.sum()),
                                 "bitexact": bitexact}
    ok_gather = all(r["bitexact"] and r["hits"] > 0
                    for r in gather_results.values())

    artifact = {
        "ok": bool(ok_dot and ok_gather),
        "backend": backend,
        "limb_dot": {"max_rel_err": rel, "bound": 2.0 ** -20,
                     "ok": bool(ok_dot),
                     "rows": rows, "k_live": pal.K_LIVE,
                     "packed_k": 6 * pal.K_LIVE},
        "onehot_gather": gather_results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"limb dot max rel err {rel:.3e} (bound {2.0**-20:.3e}) "
          f"-> {'OK' if ok_dot else 'FAIL'}")
    for accel, r in gather_results.items():
        print(f"gather[{accel}]: {r['hits']} hits, "
              f"bitexact={r['bitexact']}")
    print(f"wrote {os.path.abspath(out_path)} ok={artifact['ok']}")
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
