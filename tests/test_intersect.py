"""Intersection math tests: Moller-Trumbore vs analytic hits + oracle props."""

import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.geometry.intersect import (
    intersect_aabb,
    intersect_any_bruteforce,
    intersect_closest_bruteforce,
    moller_trumbore,
)


def _tri():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    return v0, v1, v2


def test_hit_center():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    valid, t, u, v = moller_trumbore(o, d, v0, v1, v2)
    assert bool(valid[0, 0])
    assert np.isclose(t[0, 0], 1.0)
    assert np.isclose(u[0, 0], 0.25) and np.isclose(v[0, 0], 0.25)


def test_miss_outside():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.9, 0.9, 1.0]])  # outside the hypotenuse
    d = jnp.array([[0.0, 0.0, -1.0]])
    valid, *_ = moller_trumbore(o, d, v0, v1, v2)
    assert not bool(valid[0, 0])


def test_parallel_ray_misses():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])  # parallel to the plane
    valid, *_ = moller_trumbore(o, d, v0, v1, v2)
    assert not bool(valid[0, 0])


def test_behind_origin_misses():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])  # triangle is behind
    valid, *_ = moller_trumbore(o, d, v0, v1, v2)
    assert not bool(valid[0, 0])


def test_unnormalized_dir_scales_t():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, 2.0]])
    d = jnp.array([[0.0, 0.0, -4.0]])
    valid, t, u, v = moller_trumbore(o, d, v0, v1, v2)
    assert bool(valid[0, 0]) and np.isclose(t[0, 0], 0.5)


def test_closest_picks_nearest_and_lowest_id_on_tie(rng):
    # Two parallel triangles; ray hits both; nearest wins.
    v0 = jnp.array([[0, 0, 0], [0, 0, -1.0]], jnp.float32)
    v1 = jnp.array([[1, 0, 0], [1, 0, -1.0]], jnp.float32)
    v2 = jnp.array([[0, 1, 0], [0, 1, -1.0]], jnp.float32)
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, tid, u, v = intersect_closest_bruteforce(o, d, v0, v1, v2)
    assert bool(hit[0]) and int(tid[0]) == 0 and np.isclose(t[0], 1.0)

    # Identical duplicated triangle -> tie -> lowest id.
    hit, t, tid, *_ = intersect_closest_bruteforce(
        o, d, v0[:1].repeat(2, 0), v1[:1].repeat(2, 0), v2[:1].repeat(2, 0)
    )
    assert int(tid[0]) == 0


def test_closest_chunked_equals_unchunked(rng, cornell_scene):
    s = cornell_scene
    R = 64
    o = jnp.asarray(
        rng.uniform([100, 100, 100], [450, 450, 450], (R, 3)), jnp.float32
    )
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    a = intersect_closest_bruteforce(o, d, s.tri_v0, s.tri_v1, s.tri_v2, chunk=5)
    b = intersect_closest_bruteforce(o, d, s.tri_v0, s.tri_v1, s.tri_v2, chunk=64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_any_hit_excludes_light_and_respects_tmax(cornell_scene):
    s = cornell_scene
    # From box center toward the light (tri ids 6,7 are the light, y=548).
    o = jnp.array([[278.0, 273.0, 279.6]])
    d_up = jnp.array([[0.0, 1.0, 0.0]])
    light_id = int(np.asarray(s.light_ids)[0])

    # Excluding the light and stopping just below the ceiling: clear.
    occ = intersect_any_bruteforce(
        o, d_up, s.tri_v0, s.tri_v1, s.tri_v2,
        jnp.array([274.9]), jnp.array([light_id]),
    )
    # The other light triangle may still block; exclude both by tmax below 548.
    occ_short = intersect_any_bruteforce(
        o, d_up, s.tri_v0, s.tri_v1, s.tri_v2,
        jnp.array([200.0]), jnp.array([-1]),
    )
    assert not bool(occ_short[0])

    # Without exclusion and tmax beyond the ceiling: occluded.
    occ_far = intersect_any_bruteforce(
        o, d_up, s.tri_v0, s.tri_v1, s.tri_v2,
        jnp.array([1000.0]), jnp.array([-1]),
    )
    assert bool(occ_far[0])
    del occ


def test_aabb_slab(cornell_scene):
    s = cornell_scene
    o = jnp.array([[278.0, 273.0, -800.0], [278.0, 2000.0, 279.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    tmin, tmax = intersect_aabb(o, d, s.world_min, s.world_max)
    assert tmax[0] >= tmin[0] and tmax[0] >= 0  # enters the box
    assert tmax[1] < 0  # box is behind the ray


def test_every_cornell_triangle_hittable(cornell_scene):
    """Shoot a ray at each triangle's centroid from the box interior; the
    brute-force intersector must report a hit (coverage invariant that the
    BVH traversal is later tested against)."""
    s = cornell_scene
    v0 = np.asarray(s.tri_v0)
    v1 = np.asarray(s.tri_v1)
    v2 = np.asarray(s.tri_v2)
    centroids = (v0 + v1 + v2) / 3.0
    eye = np.array([278.0, 273.0, 279.6], np.float32)
    o = jnp.asarray(np.broadcast_to(eye, centroids.shape))
    d = jnp.asarray(centroids - eye)
    hit, t, tid, u, v = intersect_closest_bruteforce(
        o, d, s.tri_v0, s.tri_v1, s.tri_v2
    )
    assert bool(jnp.all(hit))
    # Each ray's first hit is at t <= 1 (the centroid itself or closer).
    assert float(jnp.max(t)) <= 1.0 + 1e-5
