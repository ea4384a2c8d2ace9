"""Pallas TPU kernels for the ray-triangle intersection hot loop.

The reference's innermost hot loop is Moller-Trumbore over kd-tree leaves
(``src/kdtree.cpp:219-246``).  On TPU the equivalent dense formulation is a
(ray_tile x tri_chunk) pairwise sweep living entirely in VMEM:

- Rays are tiled over the grid; each program owns ``RAY_TILE`` rays.
- Triangle SoA columns (v0/e1/e2 per axis) stay resident in VMEM and are
  streamed ``TRI_CHUNK`` at a time through a ``fori_loop`` inside the kernel,
  with the running best (t, id, u, v) kept in VMEM scratch.
- Every operand is laid out rank-2 ``(RAY_TILE, TRI_CHUNK)``: ray coordinates
  broadcast down columns, triangle coordinates broadcast across rows, so the
  whole Moller-Trumbore chain is aligned elementwise VPU work with a
  128-multiple minor dimension — no HBM round-trips for intermediates (the
  XLA version of the same sweep materializes (R, T) temporaries in HBM and
  is bandwidth-bound).

Triangle data is duplicated to (1, T) row vectors on the host side once per
scene; ray coordinates enter as (R, 1) column vectors.

These kernels are exact drop-ins for the brute-force oracle
(``geometry/intersect.py``) — same epsilon, same acceptance conditions, same
tie-breaking (lowest triangle id) — validated by ``tests/test_pallas.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chiaroscuro_tpu.geometry.intersect import AnyFn, ClosestFn, ClosestHit
from chiaroscuro_tpu.scene.scene_arrays import SceneArrays

FLT_EPS = np.float32(np.finfo(np.float32).eps)
BIG = np.float32(3.0e38)

RAY_TILE = 256
MAX_TRI_CHUNK = 512          # VMEM working-set cap per inner iteration
LANE = 128                   # TPU minor-dim alignment


def _tri_chunk_for(n_tris: int) -> int:
    """Smallest lane-aligned chunk covering the scene, capped: tiny scenes
    (cornell: 36 tris) pad to one 128-wide chunk instead of 512 — a 4x
    useful-work ratio improvement measured on-chip."""
    aligned = -(-max(n_tris, 1) // LANE) * LANE
    return min(MAX_TRI_CHUNK, aligned)


# Shading-attribute matrix columns (padded to ATTR_K for MXU alignment).
ATTR_LAYOUT = {
    "v0": slice(0, 3),
    "e1": slice(3, 6),
    "e2": slice(6, 9),
    "normal": slice(9, 12),
    "kd": slice(12, 15),
    "ke": slice(15, 18),
    "uv0": slice(18, 20),
    "uv1": slice(20, 22),
    "uv2": slice(22, 24),
    "btype": slice(24, 25),
    "texid": slice(25, 26),
    "ks": slice(26, 29),
    "ns": slice(29, 30),
    "texid_ks": slice(30, 31),
}
ATTR_K = 32


def _prep_attrs(scene, chunk):
    """(T_pad, ATTR_K) f32 shading-attribute matrix, one row per triangle.
    Fetched in-kernel as one-hot @ attrs (an MXU matmul) instead of per-field
    HBM gathers.  Int columns (btype/texid) ride as exact small floats."""
    import numpy as _np

    T = scene.tri_v0.shape[0]
    pad = (-T) % chunk
    A = _np.zeros((T + pad, ATTR_K), _np.float32)
    v0 = _np.asarray(scene.tri_v0)
    A[:T, ATTR_LAYOUT["v0"]] = v0
    A[:T, ATTR_LAYOUT["e1"]] = _np.asarray(scene.tri_v1) - v0
    A[:T, ATTR_LAYOUT["e2"]] = _np.asarray(scene.tri_v2) - v0
    A[:T, ATTR_LAYOUT["normal"]] = _np.asarray(scene.normal)
    A[:T, ATTR_LAYOUT["kd"]] = _np.asarray(scene.kd)
    A[:T, ATTR_LAYOUT["ke"]] = _np.asarray(scene.ke)
    A[:T, ATTR_LAYOUT["uv0"]] = _np.asarray(scene.uv0)
    A[:T, ATTR_LAYOUT["uv1"]] = _np.asarray(scene.uv1)
    A[:T, ATTR_LAYOUT["uv2"]] = _np.asarray(scene.uv2)
    A[:T, ATTR_LAYOUT["btype"]] = _np.asarray(scene.brdf_type)[:, None]
    A[:T, ATTR_LAYOUT["texid"]] = _np.asarray(scene.tex_id)[:, None]
    A[:T, ATTR_LAYOUT["ks"]] = _np.asarray(scene.ks)
    A[:T, ATTR_LAYOUT["ns"]] = _np.asarray(scene.shininess)[:, None]
    A[:T, ATTR_LAYOUT["texid_ks"]] = _np.asarray(scene.tex_id_ks)[:, None]
    return jnp.asarray(A)


def unpack_attrs(mat):
    """(R, ATTR_K) kernel output -> dict of per-field arrays."""
    out = {}
    for name, sl in ATTR_LAYOUT.items():
        col = mat[:, sl]
        if name in ("btype", "texid", "texid_ks"):
            out[name] = jnp.round(col[:, 0]).astype(jnp.int32)
        elif name == "ns":
            out[name] = col[:, 0]
        else:
            out[name] = col
    return out


def _pad_rays(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _prep_tris(v0, v1, v2, chunk):
    """Host-side packing: pad T to a chunk multiple, return (9, T) SoA rows
    [v0x v0y v0z e1x e1y e1z e2x e2y e2z].  Padding rows are zero => the
    determinant is 0 => padded triangles never hit."""
    T = v0.shape[0]
    pad = (-T) % chunk
    z = jnp.zeros((pad, 3), v0.dtype)
    v0p = jnp.concatenate([v0, z])
    e1p = jnp.concatenate([v1 - v0, z])
    e2p = jnp.concatenate([v2 - v0, z])
    soa = jnp.concatenate([v0p.T, e1p.T, e2p.T], axis=0)  # (9, T_pad)
    return soa, T + pad


def _mt_block(o, d, tri):
    """Moller-Trumbore on a (RAY_TILE, C) block.

    o, d: tuples of (RAY_TILE, 1) ray coordinate columns.
    tri: (9, C) SoA rows.
    Returns (ok, t, u, v), each (RAY_TILE, C).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = tri[0:1], tri[1:2], tri[2:3]
    e1x, e1y, e1z = tri[3:4], tri[4:5], tri[5:6]
    e2x, e2y, e2z = tri[6:7], tri[7:8], tri[8:9]

    # p = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    a = e1x * px + e1y * py + e1z * pz
    nonpar = jnp.abs(a) >= FLT_EPS
    f = 1.0 / jnp.where(nonpar, a, 1.0)

    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * px + sy * py + sz * pz)
    # q = cross(s, e1)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)

    ok = (
        nonpar
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return ok, t, u, v


def _closest_kernel(
    o_ref, d_ref, tri_ref, attr_ref, t_ref, id_ref, u_ref, v_ref, attr_out,
    *, chunk,
):
    C = chunk
    n_chunks = tri_ref.shape[1] // C

    o = (o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3])
    d = (d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3])

    col = jax.lax.broadcasted_iota(jnp.int32, (o_ref.shape[0], C), 1)

    def body(j, carry):
        best_t, best_id, best_u, best_v, best_attr = carry
        tri = tri_ref[:, pl.ds(j * C, C)]
        ok, t, u, v = _mt_block(o, d, tri)
        t = jnp.where(ok, t, BIG)
        # Lowest-id tie-break: argmin picks the first minimum in the chunk;
        # strict < update keeps earlier chunks on inter-chunk ties.
        tmin = jnp.min(t, axis=1, keepdims=True)                 # (R, 1)
        is_min = t == tmin
        idx = jnp.min(jnp.where(is_min, col, C), axis=1, keepdims=True)
        sel = col == idx
        cu = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        cv = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        cid = j * C + idx
        better = tmin < best_t
        # Shading-attribute fetch as a one-hot matmul on the MXU: sel is
        # exactly one-hot per row, so sel @ attrs == attrs[best_id_in_chunk].
        cattr = jnp.dot(
            sel.astype(jnp.float32),
            attr_ref[pl.ds(j * C, C), :],
            preferred_element_type=jnp.float32,
        )
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, cid, best_id),
            jnp.where(better, cu, best_u),
            jnp.where(better, cv, best_v),
            jnp.where(better, cattr, best_attr),
        )

    R = o_ref.shape[0]
    init = (
        jnp.full((R, 1), BIG, jnp.float32),
        jnp.zeros((R, 1), jnp.int32),
        jnp.zeros((R, 1), jnp.float32),
        jnp.zeros((R, 1), jnp.float32),
        jnp.zeros((R, attr_out.shape[1]), jnp.float32),
    )
    best_t, best_id, best_u, best_v, best_attr = jax.lax.fori_loop(
        0, n_chunks, body, init
    )
    t_ref[:, :] = best_t
    id_ref[:, :] = best_id
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v
    attr_out[:, :] = best_attr


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def _closest_call(origins, dirs, tri_soa, attrs, chunk, interpret=False):
    R = origins.shape[0]
    n_tiles = R // RAY_TILE
    grid = (n_tiles,)
    out_shape = [
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.int32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, ATTR_K), jnp.float32),
    ]
    ray_spec = pl.BlockSpec(
        (RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    attr_out_spec = pl.BlockSpec(
        (RAY_TILE, ATTR_K), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_closest_kernel, chunk=chunk),
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            ray_spec,
            ray_spec,
            pl.BlockSpec(tri_soa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(attrs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4 + [attr_out_spec],
        interpret=interpret,
    )(origins, dirs, tri_soa, attrs)


def _any_kernel(o_ref, d_ref, tmax_ref, excl_ref, tri_ref, occ_ref, *, chunk):
    C = chunk
    n_chunks = tri_ref.shape[1] // C

    o = (o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3])
    d = (d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3])
    tmax = tmax_ref[:, :]
    excl = excl_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (o_ref.shape[0], C), 1)

    def body(j, occ):
        tri = tri_ref[:, pl.ds(j * C, C)]
        ok, t, _, _ = _mt_block(o, d, tri)
        ids = j * C + col
        blocking = ok & (t < tmax) & (ids != excl)
        return occ | jnp.any(blocking, axis=1, keepdims=True)

    R = o_ref.shape[0]
    occ = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((R, 1), bool))
    occ_ref[:, :] = occ


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def _any_call(origins, dirs, tmax, excl, tri_soa, chunk, interpret=False):
    R = origins.shape[0]
    grid = (R // RAY_TILE,)
    ray_spec = pl.BlockSpec(
        (RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_any_kernel, chunk=chunk),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.bool_),
        in_specs=[
            ray_spec,
            ray_spec,
            col_spec,
            col_spec,
            pl.BlockSpec(tri_soa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=col_spec,
        interpret=interpret,
    )(origins, dirs, tmax, excl, tri_soa)


def make_pallas_intersectors(
    scene: SceneArrays, interpret: bool | None = None
) -> Tuple[ClosestFn, AnyFn]:
    """Brute-force Pallas intersectors over the scene's triangles.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    chunk = _tri_chunk_for(scene.n_tris)
    tri_soa, _ = _prep_tris(scene.tri_v0, scene.tri_v1, scene.tri_v2, chunk)
    attr_mat = _prep_attrs(scene, chunk)

    def closest_fn(origins, dirs) -> ClosestHit:
        R = origins.shape[0]
        o = _pad_rays(origins, RAY_TILE)
        d = _pad_rays(dirs, RAY_TILE)
        t, tid, u, v, am = _closest_call(
            o, d, tri_soa, attr_mat, chunk, interpret=interpret
        )
        t = t[:R, 0]
        return ClosestHit(
            t < BIG, t, tid[:R, 0], u[:R, 0], v[:R, 0], unpack_attrs(am[:R])
        )

    def any_fn(origins, dirs, tmax, exclude_id):
        R = origins.shape[0]
        o = _pad_rays(origins, RAY_TILE)
        d = _pad_rays(dirs, RAY_TILE)
        tm = _pad_rays(tmax.reshape(-1, 1), RAY_TILE)
        ex = _pad_rays(exclude_id.reshape(-1, 1).astype(jnp.int32), RAY_TILE)
        occ = _any_call(o, d, tm, ex, tri_soa, chunk, interpret=interpret)
        return occ[:R, 0]

    return closest_fn, any_fn
