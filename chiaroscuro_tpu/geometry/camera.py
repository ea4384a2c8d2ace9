"""Camera ray generation from (eye, look-at, up, yview).

Reproduces the reference's screen-corner rotation math
(``src/rayTracer.cpp:41-49``): with z = 1, y = z * yview / 2,
x = y * xres / yres, the pixel-step vectors and upper-left corner are rotated
by the inverse of the ``glm::lookAt`` rotation.  For a pure rotation the
inverse is the transpose, whose columns are the camera's right / up / -forward
axes — so we build the basis directly instead of inverting a matrix.

Primary ray directions are intentionally **unnormalized**, as in the reference
(``rayTracer.cpp:60-62``): Moller-Trumbore's barycentric output and hit points
are invariant to |dir|, and all shading uses re-normalized vectors.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v):
    return v / jnp.linalg.norm(v)


def camera_basis(eye, center, up, yview, xres: int, yres: int):
    """Returns (left_upper, dx, dy): the world-space upper-left ray direction
    and the per-pixel step vectors (``rayTracer.cpp:41-49``)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)

    z = jnp.float32(1.0)
    y = z * 0.5 * jnp.float32(yview)
    x = y * (jnp.float32(xres) / jnp.float32(yres))

    # glm::lookAt basis: f = normalize(center-eye), s = normalize(cross(f, up)),
    # u = cross(s, f).  inverse(mat3(lookAt)) has columns [s, u, -f], so
    # rotate * (vx, vy, vz) = vx*s + vy*u - vz*f.
    f = _normalize(center - eye)
    s = _normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)

    dy = (1.0 / yres) * (-2.0 * y) * u          # rotate * (0, -2y, 0) / yres
    dx = (1.0 / xres) * (2.0 * x) * s           # rotate * (2x, 0, 0) / xres
    left_upper = -x * s + y * u + z * f         # rotate * (-x, y, -z)
    return left_upper, dx, dy


def primary_ray_dirs(left_upper, dx, dy, px, py, jx, jy):
    """Unnormalized primary directions for pixel columns ``px``, rows ``py``
    with AA jitters ``jx, jy`` in [0,1) (``rayTracer.cpp:60-62``).

    px/py/jx/jy: broadcastable arrays -> (..., 3) directions.
    """
    cx = (px + jx)[..., None]
    cy = (py + jy)[..., None]
    return left_upper + cx * dx + cy * dy


def primary_ray_dirs_planar(left_upper, dx, dy, px, py, jx, jy):
    """Planar :func:`primary_ray_dirs`: px/py/jx/jy shaped B ->
    (3, *B) component-major directions (see geometry/planar.py)."""
    cx = (px + jx)[None]
    cy = (py + jy)[None]
    nd = cx.ndim - 1
    exp = (slice(None),) + (None,) * nd
    return left_upper[exp] + cx * dx[exp] + cy * dy[exp]
