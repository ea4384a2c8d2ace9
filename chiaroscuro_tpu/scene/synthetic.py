"""Synthetic sponza-scale scene: a procedural colonnaded atrium.

The reference's flagship renders are sponza-class (``renders/sponza_crytek.exr``
1280x720, ``renders/sponza.exr``, ``renders/conference.exr``; its kd-tree
``src/kdtree.cpp:110-344`` exists for exactly these scenes), but the OBJ
assets themselves were never shipped (SURVEY.md §2 C15).  This module fills
that gap honestly: a fully procedural atrium — tessellated hall, two
colonnades, emissive ceiling panels, scattered crates — whose triangle count
is a parameter, so the HBM-streaming cluster kernels can be exercised and
benchmarked *at their design point* (packed cluster matrix above the VMEM
residency budget, ``ops/cluster_pallas.py`` ``RESIDENT_BUDGET_BYTES``).

Everything is plain numpy -> :class:`~chiaroscuro_tpu.scene.obj_loader.Mesh`
lists, consumed by :func:`~chiaroscuro_tpu.scene.scene_arrays.build_scene_arrays`
like any loaded OBJ.  Deterministic for a given (target_tris, seed).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from chiaroscuro_tpu.scene.obj_loader import Mesh

# Hall dimensions (meters): x = length, y = height, z = width.
HALL_L = 24.0
HALL_H = 10.0
HALL_W = 12.0

# Camera looking down the hall from one end (analog of the shipped
# sponza_crytek.exr viewpoint: low, near a wall, facing the colonnade).
ATRIUM_CAMERA = dict(
    eye=(1.8, 4.2, 5.0),
    center=(24.0, 3.2, 6.8),
    up=(0.0, 1.0, 0.0),
    yview=0.9,
)


def _mesh(name, positions, normals, indices, kd, ke=(0.0, 0.0, 0.0)) -> Mesh:
    v = np.asarray(positions, np.float32).reshape(-1, 3)
    return Mesh(
        name=name,
        positions=v,
        normals=np.asarray(normals, np.float32).reshape(-1, 3),
        uvs=np.zeros((len(v), 2), np.float32),
        indices=np.asarray(indices, np.int32).reshape(-1, 3),
        diffuse=np.asarray(kd, np.float32),
        emissive=np.asarray(ke, np.float32),
        ambient=np.zeros(3, np.float32),
        specular=np.zeros(3, np.float32),
        shininess=0.0,
    )


def _grid_quad_indices(nu: int, nv: int) -> np.ndarray:
    """(2*nu*nv, 3) triangle indices over an (nu+1) x (nv+1) vertex grid."""
    i = np.arange(nu, dtype=np.int32)
    j = np.arange(nv, dtype=np.int32)
    jj, ii = np.meshgrid(j, i, indexing="ij")       # (nv, nu)
    a = jj * (nu + 1) + ii
    b = a + 1
    c = a + (nu + 1)
    d = c + 1
    return np.concatenate(
        [np.stack([a, b, d], -1).reshape(-1, 3),
         np.stack([a, d, c], -1).reshape(-1, 3)]
    )


def _grid_mesh(name, origin, du, dv, nu, nv, kd, ke=(0.0, 0.0, 0.0)) -> Mesh:
    """Tessellated parallelogram: origin + u*du + v*dv, u in [0,nu], v in [0,nv]."""
    origin = np.asarray(origin, np.float32)
    du = np.asarray(du, np.float32)
    dv = np.asarray(dv, np.float32)
    u = np.arange(nu + 1, dtype=np.float32)
    v = np.arange(nv + 1, dtype=np.float32)
    pts = (origin[None, None]
           + u[None, :, None] * du[None, None]
           + v[:, None, None] * dv[None, None])     # (nv+1, nu+1, 3)
    n = np.cross(du, dv)
    n = (n / np.linalg.norm(n)).astype(np.float32)
    pts = pts.reshape(-1, 3)
    return _mesh(name, pts, np.broadcast_to(n, pts.shape),
                 _grid_quad_indices(nu, nv), kd, ke)


def _cylinder_mesh(name, cx, cz, radius, y0, y1, nseg, nstack, kd) -> Mesh:
    """Open cylinder (no caps — columns meet floor and ceiling)."""
    theta = np.linspace(0.0, 2 * np.pi, nseg + 1, dtype=np.float32)
    y = np.linspace(y0, y1, nstack + 1, dtype=np.float32)
    ct, st = np.cos(theta), np.sin(theta)
    px = cx + radius * ct[None, :].repeat(nstack + 1, 0)
    pz = cz + radius * st[None, :].repeat(nstack + 1, 0)
    py = y[:, None].repeat(nseg + 1, 1)
    pts = np.stack([px, py, pz], -1).reshape(-1, 3)
    nrm = np.stack(
        [ct[None, :].repeat(nstack + 1, 0),
         np.zeros_like(px),
         st[None, :].repeat(nstack + 1, 0)], -1,
    ).reshape(-1, 3)
    return _mesh(name, pts, nrm, _grid_quad_indices(nseg, nstack), kd)


def _box_meshes(name, center, size, yaw, kd) -> List[Mesh]:
    """Axis-box rotated about y: six single-quad grids (flat normals)."""
    cx, cy, cz = center
    sx, sy, sz = size
    c, s = np.cos(yaw), np.sin(yaw)

    def rot(p):
        x, y, z = p
        return (cx + c * x - s * z, cy + y, cz + s * x + c * z)

    hx, hy, hz = sx / 2, sy / 2, sz / 2
    # du/dv ordered so cross(du, dv) faces OUT of the box (the integrator
    # shades with stored normals raw; an inward normal kills NEE's
    # max(0, dot(n, wl)) term and offsets shadow origins inside the box).
    faces = [
        ((-hx, -hy, -hz), (0, sy, 0), (sx, 0, 0)),   # front  (-z)
        ((hx, -hy, hz), (0, sy, 0), (-sx, 0, 0)),    # back   (+z)
        ((-hx, -hy, hz), (0, sy, 0), (0, 0, -sz)),   # left   (-x)
        ((hx, -hy, -hz), (0, sy, 0), (0, 0, sz)),    # right  (+x)
        ((-hx, hy, -hz), (0, 0, sz), (sx, 0, 0)),    # top    (+y)
        ((-hx, -hy, hz), (0, 0, -sz), (sx, 0, 0)),   # bottom (-y)
    ]
    out = []
    for fi, (origin, du, dv) in enumerate(faces):
        o = np.asarray(rot(origin), np.float32)
        duv = np.asarray(rot(du), np.float32) - np.asarray(rot((0, 0, 0)), np.float32)
        dvv = np.asarray(rot(dv), np.float32) - np.asarray(rot((0, 0, 0)), np.float32)
        out.append(_grid_mesh(f"{name}:f{fi}", o, duv, dvv, 1, 1, kd))
    return out


def atrium(target_tris: int = 480_000, seed: int = 0) -> List[Mesh]:
    """Procedural colonnaded atrium with ~``target_tris`` triangles.

    Geometry mix (so the intersector sees sponza-like structure, not a
    uniform soup): ~45% of the budget in 24 colonnade columns (curved,
    finely tessellated), ~55% in the hall's six tessellated surfaces, plus
    a fixed count of emissive ceiling panels (area lights for NEE) and
    jittered crates.  Deterministic for a given (target_tris, seed).
    """
    rng = np.random.default_rng(seed)
    meshes: List[Mesh] = []

    # --- emissive ceiling panels (fixed: 24 light triangles) ------------
    eps = 0.02
    for i in range(4):
        for j in range(3):
            x0 = 2.5 + i * 5.5
            z0 = 2.0 + j * 3.5
            meshes.append(_grid_mesh(
                f"light_{i}_{j}:light", (x0, HALL_H - eps, z0),
                (2.2, 0, 0), (0, 0, 1.6), 1, 1,
                kd=(0.9, 0.9, 0.9), ke=(22.0, 21.0, 17.0),
            ))

    # --- crates (fixed: 60 boxes x 12 tris) ------------------------------
    for b in range(60):
        w = rng.uniform(0.5, 1.4)
        h = rng.uniform(0.5, 1.6)
        meshes.extend(_box_meshes(
            f"crate{b}:wood",
            (rng.uniform(2, HALL_L - 2), h / 2, rng.uniform(1, HALL_W - 1)),
            (w, h, w), rng.uniform(0, np.pi / 2),
            kd=(0.50, 0.36, 0.22),
        ))

    fixed = sum(len(m.indices) for m in meshes)
    budget = max(target_tris - fixed, 2_000)

    # --- colonnades: 2 rows x 12 columns ---------------------------------
    col_budget = int(budget * 0.45)
    n_cols = 24
    # tris per column = 2 * nseg * nstack, with nstack = 2 * nseg.
    nseg = max(4, int(np.sqrt(col_budget / n_cols / 4.0)))
    nstack = 2 * nseg
    k = 0
    for zrow in (3.0, 9.0):
        for i in range(12):
            meshes.append(_cylinder_mesh(
                f"col{k}:stone", 2.0 + i * 2.0, zrow, 0.35, 0.0, HALL_H,
                nseg, nstack, kd=(0.72, 0.68, 0.62),
            ))
            k += 1

    # --- hall surfaces ----------------------------------------------------
    surf_budget = budget - 2 * nseg * nstack * n_cols
    # total surface area; per-surface grid density ~ sqrt(tris / (2*area))
    areas = {
        "floor": HALL_L * HALL_W, "ceiling": HALL_L * HALL_W,
        "wall_z0": HALL_L * HALL_H, "wall_z1": HALL_L * HALL_H,
        "wall_x0": HALL_W * HALL_H, "wall_x1": HALL_W * HALL_H,
    }
    density = max(surf_budget, 12.0) / (2.0 * sum(areas.values()))
    pitch = 1.0 / np.sqrt(max(density, 1e-6))

    def n_of(extent):
        return max(1, int(round(extent / pitch)))

    # du/dv ordered so cross(du, dv) faces the hall INTERIOR (floor up,
    # ceiling down, walls inward) — shading normals are used raw by the
    # integrator, so an outward normal makes the surface receive no light.
    surfs = [
        ("floor:stone", (0, 0, 0), (0, 0, HALL_W), (HALL_L, 0, 0),
         (0.55, 0.52, 0.48)),
        ("ceiling:stone", (0, HALL_H, 0), (HALL_L, 0, 0), (0, 0, HALL_W),
         (0.62, 0.60, 0.58)),
        ("wall_z0:brick", (0, 0, 0), (HALL_L, 0, 0), (0, HALL_H, 0),
         (0.58, 0.40, 0.30)),
        ("wall_z1:brick", (0, 0, HALL_W), (0, HALL_H, 0), (HALL_L, 0, 0),
         (0.58, 0.40, 0.30)),
        ("wall_x0:plaster", (0, 0, 0), (0, HALL_H, 0), (0, 0, HALL_W),
         (0.70, 0.66, 0.58)),
        ("wall_x1:plaster", (HALL_L, 0, 0), (0, 0, HALL_W), (0, HALL_H, 0),
         (0.70, 0.66, 0.58)),
    ]
    for name, origin, du, dv, kd in surfs:
        lu = float(np.linalg.norm(du))
        lv = float(np.linalg.norm(dv))
        nu, nv = n_of(lu), n_of(lv)
        meshes.append(_grid_mesh(
            name, origin,
            np.asarray(du, np.float32) / nu, np.asarray(dv, np.float32) / nv,
            nu, nv, kd,
        ))
    return meshes


def atrium_tri_count(meshes: Sequence[Mesh]) -> int:
    return sum(len(m.indices) for m in meshes)
