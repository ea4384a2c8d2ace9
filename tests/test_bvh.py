"""BVH build invariants + traversal-vs-oracle equivalence tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from chiaroscuro_tpu.accel.bvh import (
    build_bvh,
    bvh_any,
    bvh_closest,
)
from chiaroscuro_tpu.geometry.intersect import (
    intersect_any_bruteforce,
    intersect_closest_bruteforce,
)
from chiaroscuro_tpu.scene.builtin import cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


@pytest.fixture(scope="module")
def cornell():
    scene = build_scene_arrays(cornell_box())
    return scene, build_bvh(scene, leaf_size=4)


def test_build_invariants(cornell):
    scene, bvh = cornell
    ls = np.asarray(bvh.leaf_start)
    lc = np.asarray(bvh.leaf_count)
    order = np.asarray(bvh.tri_order)
    miss = np.asarray(bvh.miss_link)

    # Every triangle appears exactly once across leaves.
    covered = []
    for s, c in zip(ls, lc):
        if c > 0:
            covered.extend(order[s : s + c].tolist())
    assert sorted(covered) == list(range(scene.n_tris))

    # Leaf sizes bounded.
    assert lc.max() <= bvh.leaf_size

    # Threading: root's miss is sentinel; every miss link is -1 or a node
    # strictly after the current one (DFS escape).
    assert miss[0] == -1
    n = bvh.n_nodes
    for i in range(n):
        assert miss[i] == -1 or i < miss[i] < n + 1

    # Child boxes are contained in the root box.
    bmn = np.asarray(bvh.bbox_min)
    bmx = np.asarray(bvh.bbox_max)
    assert (bmn >= bmn[0] - 1e-5).all() and (bmx <= bmx[0] + 1e-5).all()


def _random_rays(scene, rng, n=512):
    lo = np.asarray(scene.world_min)
    hi = np.asarray(scene.world_max)
    origins = rng.uniform(lo - 0.2 * (hi - lo), hi + 0.2 * (hi - lo), (n, 3))
    dirs = rng.normal(size=(n, 3))
    return (
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
    )


def test_closest_matches_oracle(cornell, rng):
    scene, bvh = cornell
    o, d = _random_rays(scene, rng)
    bh, bt, btid, bu, bv = bvh_closest(bvh, o, d)
    oh, ot, otid, ou, ov = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2
    )
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(oh))
    hit = np.asarray(oh)
    # Distances must agree to float tolerance (different evaluation order
    # of identical math: BVH precomputes e1/e2 on host, oracle on device).
    np.testing.assert_allclose(
        np.asarray(bt)[hit], np.asarray(ot)[hit], rtol=1e-5, atol=1e-6
    )
    # Different triangle ids are acceptable only on exact-tie hits (cornell's
    # floor contains coplanar overlapping quads -> equal t for two tris).
    agree = np.asarray(btid)[hit] == np.asarray(otid)[hit]
    tie_ok = np.isclose(np.asarray(bt)[hit], np.asarray(ot)[hit], rtol=1e-6)
    assert (agree | tie_ok).all()
    np.testing.assert_allclose(
        np.asarray(bu)[hit][agree], np.asarray(ou)[hit][agree], rtol=1e-4,
        atol=1e-5,
    )


def test_any_matches_oracle(cornell, rng):
    scene, bvh = cornell
    o, d = _random_rays(scene, rng, n=256)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.asarray(rng.uniform(10, 1000, (256,)), jnp.float32)
    excl = jnp.asarray(rng.integers(0, scene.n_tris, (256,)), jnp.int32)
    b = bvh_any(bvh, o, d, tmax, excl)
    ref = intersect_any_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, tmax, excl
    )
    np.testing.assert_array_equal(np.asarray(b), np.asarray(ref))


def test_every_triangle_reachable(cornell):
    """Shoot rays at each triangle centroid: the BVH must find a hit with
    t matching the oracle (every-triangle-reachable invariant, SURVEY.md §4)."""
    scene, bvh = cornell
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)
    cent = (v0 + v1 + v2) / 3.0
    eye = np.array([278.0, 273.0, 279.6], np.float32)
    o = jnp.asarray(np.broadcast_to(eye, cent.shape))
    d = jnp.asarray(cent - eye)
    bh, bt, *_ = bvh_closest(bvh, o, d)
    oh, ot, *_ = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2
    )
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(oh))
    np.testing.assert_allclose(np.asarray(bt), np.asarray(ot), rtol=1e-5)


def test_nanosuit_bvh_matches_oracle(reference_data_dir, rng):
    from chiaroscuro_tpu.scene.obj_loader import load_obj

    meshes = load_obj(f"{reference_data_dir}/nanosuit.obj")
    scene = build_scene_arrays(meshes)
    bvh = build_bvh(scene, leaf_size=8)
    assert bvh.n_nodes > 1000

    o, d = _random_rays(scene, rng, n=256)
    bh, bt, btid, *_ = bvh_closest(bvh, o, d)
    oh, ot, otid, *_ = intersect_closest_bruteforce(
        o, d, scene.tri_v0, scene.tri_v1, scene.tri_v2, chunk=4096
    )
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(oh))
    hit = np.asarray(oh)
    np.testing.assert_allclose(
        np.asarray(bt)[hit], np.asarray(ot)[hit], rtol=1e-4, atol=1e-5
    )


def test_render_with_bvh_close_to_brute(cornell):
    """End-to-end render through the BVH intersectors matches the brute-force
    render (same PRNG streams -> identical sample paths -> allclose images;
    tiny FP differences possible where ties resolve differently)."""
    import dataclasses

    from chiaroscuro_tpu.accel.bvh import make_bvh_intersectors
    from chiaroscuro_tpu.accel.dispatch import make_intersectors
    from chiaroscuro_tpu.render.renderer import render_image
    from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA
    from chiaroscuro_tpu.scene.config import RenderConfig

    scene, bvh = cornell
    cam = CORNELL_CAMERA
    cfg = RenderConfig(
        xres=16, yres=16, k=2, samples=4, seed=0,
        vp=cam["eye"], la=cam["center"], up=cam["up"], yview=cam["yview"],
    )
    brute = np.asarray(
        render_image(scene, cfg, intersectors=make_intersectors(scene, "brute"))
    )
    bvh_img = np.asarray(
        render_image(scene, cfg, intersectors=make_bvh_intersectors(scene, bvh))
    )
    np.testing.assert_allclose(bvh_img, brute, rtol=1e-4, atol=1e-5)


def test_native_builder_matches_numpy():
    """The C++ builder (native/bvh_builder.cpp) reproduces the numpy
    builder's exact flattened layout on random geometry."""
    from chiaroscuro_tpu.accel.bvh import _build_host, _build_host_native

    rng = np.random.default_rng(7)
    T = 500
    v0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    v1 = (v0 + rng.uniform(-0.3, 0.3, (T, 3))).astype(np.float32)
    v2 = (v0 + rng.uniform(-0.3, 0.3, (T, 3))).astype(np.float32)

    nat = _build_host_native(v0, v1, v2, 8)
    assert nat is not None, "native BVH library failed to build"
    ref = _build_host(v0, v1, v2, 8)

    names = ["bbox_min", "bbox_max", "miss_link", "leaf_start",
             "leaf_count", "tri_order"]
    for name, a, b in zip(names, nat, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)
