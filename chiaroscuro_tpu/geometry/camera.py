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
import numpy as np

from chiaroscuro_tpu.utils.hostconst import is_traced


def camera_basis(eye, center, up, yview, xres: int, yres: int):
    """Returns (left_upper, dx, dy): the world-space upper-left ray direction
    and the per-pixel step vectors (``rayTracer.cpp:41-49``).

    Computed in numpy when every input is concrete so jitted callers capture
    the basis as *host* constants (no lowering-time device fetch — see
    utils/hostconst.py); fully traced otherwise.
    """
    xp = jnp if is_traced(eye, center, up, yview) else np

    def _normalize(v):
        return v / xp.linalg.norm(v)

    eye = xp.asarray(eye, np.float32)
    center = xp.asarray(center, np.float32)
    up = xp.asarray(up, np.float32)

    z = np.float32(1.0)
    y = z * 0.5 * np.float32(yview) if xp is np else z * 0.5 * yview
    x = y * (np.float32(xres) / np.float32(yres))

    # glm::lookAt basis: f = normalize(center-eye), s = normalize(cross(f, up)),
    # u = cross(s, f).  inverse(mat3(lookAt)) has columns [s, u, -f], so
    # rotate * (vx, vy, vz) = vx*s + vy*u - vz*f.
    f = _normalize(center - eye)
    s = _normalize(xp.cross(f, up))
    u = xp.cross(s, f)

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
