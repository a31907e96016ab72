"""Native C++ helpers vs pure-Python references."""

import numpy as np
import pytest

from mort_tpu import native
from mort_tpu.scene.bvh import build_bvh_numpy, build_bvh_via_native, leaf_aabbs
from mort_tpu.scene.types import OBJ_QUAD, OBJ_SPHERE


def _random_leaves(n, seed=0):
    rng = np.random.RandomState(seed)
    centers = (rng.randn(n, 3) * 10).astype(np.float32)
    radii = rng.uniform(0.1, 2.0, n).astype(np.float32)
    cvecs = np.zeros((n, 3), np.float32)
    nq = max(1, n // 3)
    qq = (rng.randn(nq, 3) * 5).astype(np.float32)
    qu = rng.randn(nq, 3).astype(np.float32)
    qv = rng.randn(nq, 3).astype(np.float32)
    leaves = [(OBJ_SPHERE, i) for i in range(n)] + [(OBJ_QUAD, i) for i in range(nq)]
    return leaves, centers, radii, cvecs, qq, qu, qv


def test_native_library_builds():
    assert native.have_native(), "C++ BVH builder failed to build/load"


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 499])
def test_native_bvh_matches_numpy(n):
    args = _random_leaves(n, seed=n)
    got = build_bvh_via_native(*args)
    assert got is not None
    want = build_bvh_numpy(*args)
    for g, w, name in zip(got, want,
                          ["nmin", "nmax", "left", "right", "lkind", "rkind", "leaf"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)


def test_native_bvh_speed():
    """Native build should comfortably beat numpy on large scenes."""
    import time

    args = _random_leaves(5000, seed=1)
    t0 = time.perf_counter()
    build_bvh_via_native(*args)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_bvh_numpy(*args)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy * 1.5  # generous: just prove it's not broken-slow
