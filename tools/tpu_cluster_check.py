"""On-TPU compile + oracle check of the cluster intersectors (both
resident and streaming variants) on the nanosuit scene.  Run manually or
via RUN_TPU_TESTS=1 pytest (tests/test_tpu_compiled.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.geometry.intersect import (
    intersect_any_bruteforce,
    intersect_closest_bruteforce,
)
from chiaroscuro_tpu.ops.cluster_pallas import make_cluster_intersectors
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene

REF = "/root/reference"


def main():
    print("devices:", jax.devices())
    cfg = RenderConfig.from_rtc(os.path.join(REF, "nanosuit.rtc"), [])
    cfg.obj_path = os.path.join(REF, cfg.obj_path)
    scene = load_scene(cfg)

    rng = np.random.default_rng(7)
    n = 1024
    lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
    o = jnp.asarray(
        rng.uniform(lo - 0.2 * (hi - lo), hi + 0.2 * (hi - lo), (n, 3)),
        jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    oh, ot, otid, ou, ov = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, 2048)
    oh, ot = np.asarray(oh), np.asarray(ot)

    for stream in (False, True):
        closest_fn, any_fn = make_cluster_intersectors(
            scene, interpret=False, stream=stream)
        tag = "stream" if stream else "resident"
        t0 = time.perf_counter()
        ch = closest_fn(o, d)
        jax.block_until_ready(ch.t)
        print(f"[{tag}] closest compiled+ran in {time.perf_counter()-t0:.1f}s")
        np.testing.assert_array_equal(np.asarray(ch.hit), oh)
        np.testing.assert_allclose(
            np.asarray(ch.t)[oh], ot[oh], rtol=1e-5, atol=1e-5)

        # tmax past the closest hit => hit rays must report occluded
        # (exercises the TRUE branch); misses stay unoccluded.
        tmax = jnp.where(ch.hit, ch.t * 1.5, 1e9)
        excl = jnp.full((n,), -1, jnp.int32)
        t0 = time.perf_counter()
        occ = any_fn(o, d, tmax, excl)
        jax.block_until_ready(occ)
        print(f"[{tag}] any     compiled+ran in {time.perf_counter()-t0:.1f}s")
        oocc = intersect_any_bruteforce(
            o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, tmax, excl, 2048)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(oocc))
        print(f"[{tag}] oracle-exact on {n} rays "
              f"({int(oh.sum())} hits, {int(np.asarray(occ).sum())} occl)")
    print("OK")


if __name__ == "__main__":
    main()
