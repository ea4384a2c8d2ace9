"""Planar vec3 helper tests: math equivalence + gradient safety."""

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.geometry import planar as P


def test_roundtrip_and_ops():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    p = P.to_planar(rows, (2, 128))
    assert p.shape == (3, 2, 128)
    np.testing.assert_array_equal(P.to_rows(p), rows)

    a = P.to_planar(rows)
    b = P.to_planar(jnp.roll(rows, 1, 0))
    np.testing.assert_allclose(
        P.pdot(a, b), jnp.sum(rows * jnp.roll(rows, 1, 0), -1), rtol=1e-6
    )
    np.testing.assert_allclose(
        P.to_rows(P.pcross(a, b)),
        jnp.cross(rows, jnp.roll(rows, 1, 0)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        P.pnorm(a), jnp.linalg.norm(rows, axis=-1), rtol=1e-6
    )
    np.testing.assert_allclose(
        P.to_rows(P.pnormalize(a)),
        rows / jnp.linalg.norm(rows, axis=-1, keepdims=True),
        rtol=1e-5, atol=1e-6,
    )


def test_norm_gradients_finite_at_zero():
    """pnorm/pnormalize must have finite gradients at ||v|| == 0 — a NaN
    there poisons shared-parameter grads via 0 * NaN accumulation (this was
    a real bug: padded degenerate rays NaN'd vertex-position gradients)."""
    z = jnp.zeros((3, 4))

    g = jax.grad(lambda v: jnp.sum(P.pnorm(v)))(z)
    assert np.isfinite(np.asarray(g)).all()

    g = jax.grad(lambda v: jnp.sum(P.pnormalize(v)))(z)
    assert np.isfinite(np.asarray(g)).all()
