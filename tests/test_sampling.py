"""Sampler and PRNG-stream tests: distributions + shard invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.sampling import prng
from chiaroscuro_tpu.sampling.samplers import (
    concentric_sample_disk,
    cosine_sample_hemisphere,
    perpendicular,
    sample_wi_diffuse,
    tangent_frame,
)


def _uniforms(n, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (2, n))


def test_concentric_disk_in_unit_disk():
    u, v = _uniforms(4096)
    dx, dy = concentric_sample_disk(u, v)
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert r2.max() <= 1.0 + 1e-6


def test_concentric_disk_uniform_density():
    u, v = _uniforms(1 << 16)
    dx, dy = concentric_sample_disk(u, v)
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    # For uniform density on the disk, r^2 ~ U(0,1).
    hist, _ = np.histogram(r2, bins=10, range=(0, 1))
    expected = len(r2) / 10
    assert np.abs(hist - expected).max() < 5 * np.sqrt(expected)


def test_concentric_disk_degenerate_origin():
    dx, dy = concentric_sample_disk(jnp.float32(0.5), jnp.float32(0.5))
    assert float(dx) == 0.0 and float(dy) == 0.0


def test_cosine_hemisphere_distribution():
    u, v = _uniforms(1 << 16)
    x, y, z = cosine_sample_hemisphere(u, v)
    z = np.asarray(z)
    assert z.min() >= 0.0
    # E[cos theta] = 2/3 for pdf = cos/pi.
    assert np.isclose(z.mean(), 2.0 / 3.0, atol=0.01)


def test_perpendicular_is_perpendicular(rng):
    n = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    p = perpendicular(n)
    dots = np.asarray(jnp.sum(n * p, axis=-1))
    assert np.abs(dots).max() < 1e-4


def test_tangent_frame_orthonormal(rng):
    n = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    t, b = tangent_frame(n)
    assert np.allclose(np.asarray(jnp.linalg.norm(t, axis=-1)), 1, atol=1e-5)
    assert np.allclose(np.asarray(jnp.linalg.norm(b, axis=-1)), 1, atol=1e-5)
    assert np.abs(np.asarray(jnp.sum(t * n, axis=-1))).max() < 1e-4
    assert np.abs(np.asarray(jnp.sum(t * b, axis=-1))).max() < 1e-4


def test_sample_wi_pdf_matches_cosine(rng):
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 4096, jnp.float32)
    u, v = _uniforms(4096, seed=3)
    wi, pdf = sample_wi_diffuse(n, u, v)
    cos = np.asarray(wi)[:, 2]
    np.testing.assert_allclose(np.asarray(pdf), np.maximum(0, cos) / np.pi, atol=1e-6)


def test_sample_wi_nonunit_normal_semantics(rng):
    """The reference uses the *raw* (possibly non-unit) normal everywhere in
    sample_wi (brdf.cpp:72-79): wi mixes the scaled normal before
    normalization (biasing wi toward n), and pdf = max(0, dot(n_raw, wi))/pi.
    Verify we reproduce exactly that, not a normalized-n variant."""
    base = jnp.asarray([[0.0, 0.0, 1.0]] * 64, jnp.float32)
    u, v = _uniforms(64, seed=4)
    wi3, pdf3 = sample_wi_diffuse(3.0 * base, u, v)
    # pdf is computed against the raw normal:
    np.testing.assert_allclose(
        np.asarray(pdf3),
        np.maximum(0.0, 3.0 * np.asarray(wi3)[:, 2]) / np.pi,
        rtol=1e-5,
    )
    # and the ratio cos(n_raw, wi)/pdf still cancels to pi in the integrator:
    cos_raw = 3.0 * np.asarray(wi3)[:, 2]
    np.testing.assert_allclose(cos_raw / np.asarray(pdf3), np.pi, rtol=1e-5)


def test_prng_streams_are_global_counter_based():
    """The same (pixel, sample) pair yields identical numbers regardless of
    batch shape/order -> sharding invariance."""
    pix = jnp.arange(100, dtype=jnp.uint32)
    keys_all = prng.pixel_sample_keys(0, pix, 7)
    keys_half = prng.pixel_sample_keys(0, pix[50:], 7)
    np.testing.assert_array_equal(
        np.asarray(keys_all[50:]), np.asarray(keys_half)
    )
    j_all = prng.aa_jitter_batch(keys_all)
    j_half = prng.aa_jitter_batch(keys_half)
    np.testing.assert_array_equal(np.asarray(j_all[50:]), np.asarray(j_half))


def test_prng_bounce_streams_distinct():
    key = prng.pixel_sample_key(0, jnp.uint32(5), 2)
    u1 = prng.bounce_uniforms(key, 1)
    u2 = prng.bounce_uniforms(key, 2)
    assert not np.allclose(np.asarray(u1), np.asarray(u2))
    jit = prng.aa_jitter(key)
    assert jit.shape == (2,)
