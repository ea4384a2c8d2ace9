"""Round-4 bounce-sort key sweep on the 480k-tri atrium: which lane-sort
key minimizes per-row cull overflow + visit counts for the *bounce closest*
wavefront, and what (Lsup, Le) limits stop the overflow-to-full-K cliff.

Tests cull histograms only (cheap — no kernel recompiles per variant).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel.clusters import build_clusters
from chiaroscuro_tpu.geometry.camera import camera_basis, primary_ray_dirs_planar
from chiaroscuro_tpu.ops import cluster_pallas as cp
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.scene.synthetic import ATRIUM_CAMERA, atrium

XRES, YRES = 1280, 720


def hist(tag, meta):
    t = np.asarray(meta[:, 0])
    ov = np.asarray(meta[:, 1]).astype(bool)
    print(f"  [{tag:<34s}] p50={np.percentile(t, 50):5.0f} "
          f"p90={np.percentile(t, 90):5.0f} max={t.max():5d} "
          f"sum={t.sum()/1e6:6.2f}M overflow={100*ov.mean():5.1f}%",
          flush=True)
    return t.sum()


def part1by2(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def main():
    scene = build_scene_arrays(atrium(480_000))
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    K, KS, G = ca.K, ca.KS, ca.G
    print(f"tris={scene.n_tris} K={K} KS={KS} G={G}", flush=True)
    kid_min = np.full((KS * G, 3), cp.BIG, np.float32)
    kid_max = np.full((KS * G, 3), -cp.BIG, np.float32)
    kid_min[:K] = np.asarray(ca.bbox_min)
    kid_max[:K] = np.asarray(ca.bbox_max)
    sup_min = np.asarray(ca.super_min)
    sup_max = np.asarray(ca.super_max)

    def cull_fn(Lsup, Le):
        @jax.jit
        def f(o3, d3):
            return cp._cull_rows_hier(
                o3, d3, sup_min, sup_max, kid_min.reshape(KS, G, 3),
                kid_max.reshape(KS, G, 3), K, Le, Lsup)
        return f

    # primary rays -> hits -> cosine bounce rays (same as _tpu_r4_atriumprof)
    cam = ATRIUM_CAMERA
    eye = np.asarray(cam["eye"], np.float32)
    lu, dx, dy = camera_basis(
        jnp.asarray(eye), jnp.asarray(cam["center"], jnp.float32),
        jnp.asarray(cam["up"], jnp.float32), cam["yview"], XRES, YRES)
    ys, xs = np.meshgrid(np.arange(YRES, dtype=np.int32),
                         np.arange(XRES, dtype=np.int32), indexing="ij")
    B = (XRES * YRES // 128, 128)
    zeros = jnp.zeros(B, jnp.float32)
    d3 = primary_ray_dirs_planar(
        lu, dx, dy, jnp.asarray(xs.reshape(B), jnp.float32),
        jnp.asarray(ys.reshape(B), jnp.float32), zeros, zeros)
    o3 = jnp.broadcast_to(jnp.asarray(eye)[:, None, None], (3,) + B)
    closest_fn, _ = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False, stream=True, hier=True)
    res = jax.block_until_ready(closest_fn.planar_fn(o3, d3))

    rng = np.random.default_rng(7)
    hitm = np.asarray(res.hit)
    t = np.asarray(res.t)
    o_np, d_np = np.asarray(o3), np.asarray(d3)
    hp = o_np + np.where(hitm[None], t[None], 0.0) * d_np
    n = np.asarray(res.attrs["normal"])
    nn = n / np.maximum(np.linalg.norm(n, axis=0), 1e-9)
    u1 = rng.random(B).astype(np.float32)
    u2 = rng.random(B).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(nn[2]) < 0.9, np.array([0, 0, 1.0])[:, None, None],
                 np.array([0, 1.0, 0])[:, None, None]).astype(np.float32)
    tgt = np.cross(a, nn, axis=0)
    tgt /= np.maximum(np.linalg.norm(tgt, axis=0), 1e-9)
    btg = np.cross(nn, tgt, axis=0)
    bd = (tgt * (r * np.cos(phi))[None] + btg * (r * np.sin(phi))[None]
          + nn * np.sqrt(np.maximum(1 - u1, 0.0))[None]).astype(np.float32)
    bo = (hp + 1e-3 * nn).astype(np.float32)
    park_o = np.array([1e7, 1e7, 1e7], np.float32)[:, None, None]
    bo = np.where(hitm[None], bo, park_o)
    bd = np.where(hitm[None], bd,
                  np.array([1, 0, 0], np.float32)[:, None, None])

    wmin = np.asarray(scene.world_min)
    wext = np.maximum(np.asarray(scene.world_max) - wmin, 1e-6)

    def morton(o, bits):
        m = np.zeros(o.shape[1:], np.int64)
        for ax in range(3):
            q = np.clip((o[ax] - wmin[ax]) / wext[ax] * (1 << bits),
                        0, (1 << bits) - 1).astype(np.int64)
            m |= part1by2(q) << ax
        return m

    def octant(d):
        return ((d[0] < 0).astype(np.int64)
                | ((d[1] < 0).astype(np.int64) << 1)
                | ((d[2] < 0).astype(np.int64) << 2))

    def dirfine(d, bits):
        """Per-axis |d| shares quantized to `bits` bits each (2 axes)."""
        s = np.abs(d[0]) + np.abs(d[1]) + np.abs(d[2]) + 1e-9
        b1 = np.clip(np.abs(d[0]) / s * (1 << bits), 0,
                     (1 << bits) - 1).astype(np.int64)
        b2 = np.clip(np.abs(d[1]) / s * (1 << bits), 0,
                     (1 << bits) - 1).astype(np.int64)
        return (b1 << bits) | b2

    dead = (~hitm).astype(np.int64)
    keys = {
        "K1 oct|morton5 (current)":
            (dead << 40) | (octant(bd) << 30) | morton(bo, 5),
        "K2 oct|dir2x2|morton5":
            (dead << 40) | (octant(bd) << 34) | (dirfine(bd, 2) << 30)
            | morton(bo, 5),
        "K3 oct|dir3x3|morton5":
            (dead << 40) | (octant(bd) << 36) | (dirfine(bd, 3) << 30)
            | morton(bo, 5),
        "K4 morton3|oct|dir2x2|morton5":
            (dead << 40) | (morton(bo, 3) << 31)
            | (octant(bd) << 28) | (dirfine(bd, 2) << 24) | morton(bo, 5),
        "K5 oct|dir2x2|morton6":
            (dead << 40) | (octant(bd) << 36) | (dirfine(bd, 2) << 32)
            | morton(bo, 6),
    }

    configs = [(48, 128), (96, 256), (235, 512)]
    cull_cache = {c: cull_fn(*c) for c in configs}

    for name, key in keys.items():
        order = np.argsort(key.reshape(-1), kind="stable")
        bo_s = jnp.asarray(bo.reshape(3, -1)[:, order].reshape((3,) + B))
        bd_s = jnp.asarray(bd.reshape(3, -1)[:, order].reshape((3,) + B))
        print(name, flush=True)
        for c in configs:
            meta, _, _ = cull_cache[c](bo_s, bd_s)
            hist(f"Lsup={c[0]} Le={c[1]}", meta)


if __name__ == "__main__":
    main()
