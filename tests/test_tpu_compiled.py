"""Opt-in on-TPU tests: assert the Pallas kernels *lower through Mosaic*
and match the oracle when compiled, not just in interpreter mode
(VERDICT r1 weak #3 — a vector<i1> loop carry compiled nowhere but
interpret mode until caught on-chip).

Run with:  RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -v

Skipped entirely unless RUN_TPU_TESTS=1 and a TPU is attached (the default
suite pins itself to CPU in conftest.py).
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"), reason="set RUN_TPU_TESTS=1"
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU attached")
    return jax


def test_dense_pallas_compiled_matches_oracle(tpu, cornell_scene, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chiaroscuro_tpu.geometry.intersect import intersect_closest_bruteforce
    from chiaroscuro_tpu.ops.intersect_pallas import make_pallas_intersectors

    scene = cornell_scene
    closest_fn, any_fn = make_pallas_intersectors(scene, interpret=False)
    lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
    o = jnp.asarray(rng.uniform(lo, hi, (256, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    ch = closest_fn(o, d)
    oh, ot, *_ = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, 2048)
    np.testing.assert_array_equal(np.asarray(ch.hit), np.asarray(oh))
    hit = np.asarray(oh)
    np.testing.assert_allclose(
        np.asarray(ch.t)[hit], np.asarray(ot)[hit], rtol=1e-5, atol=1e-5)
    # any-hit: tmax beyond the closest hit must occlude exactly the hit rays
    occ = any_fn(o, d, jnp.where(ch.hit, ch.t * 1.5, 1e9),
                 jnp.full((256,), -1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(occ), hit)
    del jax


def test_cluster_kernels_compiled_match_oracle_nanosuit(tpu):
    """Both cluster variants (VMEM-resident and HBM-streaming) on the
    19k-tri nanosuit scene — the large-scene production path."""
    from tools.tpu_cluster_check import main

    main()  # raises on any oracle mismatch or compile failure


def test_streaming_kernels_at_design_point_atrium(tpu):
    """HBM-streaming + supercluster cull at their design point: the
    synthetic sponza-scale atrium (~480k tris, packed matrix above the
    VMEM residency budget, so stream=True auto-engages)."""
    from tools.tpu_atrium_check import main

    main()  # raises on any oracle mismatch or compile failure
