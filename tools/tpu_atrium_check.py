"""On-TPU compile + oracle check of the HBM-streaming cluster kernels at
their design point: the synthetic sponza-scale atrium (~480k tris), whose
packed cluster matrix exceeds RESIDENT_BUDGET_BYTES so ``stream=True`` and
the supercluster cull auto-engage.  Run manually or via
RUN_TPU_TESTS=1 pytest (tests/test_tpu_compiled.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.geometry.intersect import intersect_closest_bruteforce
from chiaroscuro_tpu.ops.cluster_pallas import (
    RESIDENT_BUDGET_BYTES,
    PACK_W,
    make_cluster_intersectors,
)
from chiaroscuro_tpu.accel.clusters import build_clusters
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.scene.synthetic import atrium


def main(target_tris: int = 480_000, n_rays: int = 2048):
    print("devices:", jax.devices())
    scene = build_scene_arrays(atrium(target_tris))
    ca = build_clusters(
        np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
        np.asarray(scene.tri_v2),
    )
    packed_bytes = ca.K * ca.M * PACK_W * 4
    print(f"K={ca.K} KS={ca.KS} packed={packed_bytes / 2**20:.0f} MB")
    assert packed_bytes > RESIDENT_BUDGET_BYTES, (
        "scene too small: streaming must auto-engage for this check")

    # Pin the design-point configuration explicitly: stream + flat cull with
    # the wide (Le=512) candidate lists (auto selects the same at this
    # scale — hier is reserved for K >> 10k, see make_cluster_intersectors —
    # but a heuristic regression must fail loudly here, not silently test
    # some other configuration).
    closest_fn, any_fn = make_cluster_intersectors(
        scene, clusters=ca, interpret=False, stream=True)

    rng = np.random.default_rng(11)
    lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
    o = jnp.asarray(rng.uniform(lo, hi, (n_rays, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)

    t0 = time.perf_counter()
    ch = closest_fn(o, d)
    jax.block_until_ready(ch.t)
    print(f"[stream] closest compiled+ran in {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    oh, ot, otid, ou, ov = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, 4096)
    oh, ot = np.asarray(oh), np.asarray(ot)
    print(f"oracle ({target_tris} tris x {n_rays} rays) in "
          f"{time.perf_counter()-t0:.1f}s; hit rate {oh.mean():.2f}")

    np.testing.assert_array_equal(np.asarray(ch.hit), oh)
    np.testing.assert_allclose(
        np.asarray(ch.t)[oh], ot[oh], rtol=1e-5, atol=1e-5)
    same = np.asarray(ch.tid)[oh] == np.asarray(otid)[oh]
    ties = np.isclose(np.asarray(ch.t)[oh], ot[oh], rtol=1e-6)
    assert (same | ties).all()

    # any-hit: tmax past the closest hit => hit rays occluded, misses not.
    tmax = jnp.where(ch.hit, ch.t * 1.5, 1e9)
    excl = jnp.full((n_rays,), -1, jnp.int32)
    t0 = time.perf_counter()
    occ = any_fn(o, d, tmax, excl)
    jax.block_until_ready(occ)
    print(f"[stream] any compiled+ran in {time.perf_counter()-t0:.1f}s")
    np.testing.assert_array_equal(np.asarray(occ), oh)
    print("atrium stream == oracle: OK")


if __name__ == "__main__":
    main()
