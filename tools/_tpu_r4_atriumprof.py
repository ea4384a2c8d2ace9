"""Round-4 sponza-scale diagnosis: per-wavefront trip histograms + kernel
times for the streaming+hier cluster path on the 480k-tri atrium, for each
ray population the integrator actually issues:

  primary            pixel-order camera rays
  bounce/unsorted    cosine-sampled from primary hits, pixel order
  bounce/sorted      same rays after the integrator's (octant, cell) sort
  shadow/unsorted    NEE rays to per-lane random light points, pixel order
  shadow/sorted      same after a (light-id, cell) sort

Decides where the 35 s frame goes (closest vs any, union-bloat vs genuine
work) and whether shadow-ray reordering is the missing lever.
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
    print(f"  [{tag}] trips p50={np.percentile(t, 50):.0f} "
          f"p90={np.percentile(t, 90):.0f} p99={np.percentile(t, 99):.0f} "
          f"max={t.max()} sum={t.sum()/1e6:.2f}M overflow={100*ov.mean():.1f}%",
          flush=True)


def timed(tag, fn, *args, iters=2):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {tag:<36s} compile {c:6.1f}s  run {best*1e3:9.1f} ms", flush=True)
    return out


def sort_rows(key, arrs):
    """Global stable sort of (B0,128) / (3,B0,128) planar arrays by key."""
    B = key.shape
    flat = []
    for a in arrs:
        if a.ndim == 3:
            flat.extend(a[i].reshape(-1) for i in range(a.shape[0]))
        else:
            flat.append(a.reshape(-1))
    outs = jax.lax.sort((key.reshape(-1),) + tuple(flat), num_keys=1,
                        is_stable=True)[1:]
    res, i = [], 0
    for a in arrs:
        if a.ndim == 3:
            res.append(jnp.stack(
                [outs[i + j].reshape(B) for j in range(a.shape[0])]))
            i += a.shape[0]
        else:
            res.append(outs[i].reshape(B))
            i += 1
    return res


def main():
    scene = build_scene_arrays(atrium(480_000))
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    print(f"tris={scene.n_tris} K={ca.K} KS={ca.KS} G={ca.G}", flush=True)
    closest_fn, any_fn = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False, stream=True, hier=True)
    cull = None  # raw cull access for histograms
    Lsup = 48
    Le = min(128, ca.K)
    G, KS, K = ca.G, ca.KS, ca.K
    kid_min = np.full((KS * G, 3), cp.BIG, np.float32)
    kid_max = np.full((KS * G, 3), -cp.BIG, np.float32)
    kid_min[:K] = np.asarray(ca.bbox_min)
    kid_max[:K] = np.asarray(ca.bbox_max)

    @jax.jit
    def cull_h(o3, d3):
        return cp._cull_rows_hier(
            o3, d3, np.asarray(ca.super_min), np.asarray(ca.super_max),
            kid_min.reshape(KS, G, 3), kid_max.reshape(KS, G, 3),
            K, Le, Lsup)

    @jax.jit
    def cull_h_tmax(o3, d3, tmax):
        return cp._cull_rows_hier(
            o3, d3, np.asarray(ca.super_min), np.asarray(ca.super_max),
            kid_min.reshape(KS, G, 3), kid_max.reshape(KS, G, 3),
            K, Le, Lsup, tmax=tmax)

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
        lu, dx, dy, jnp.asarray(xs.reshape(B), jnp.float32) ,
        jnp.asarray(ys.reshape(B), jnp.float32), zeros, zeros)
    o3 = jnp.broadcast_to(jnp.asarray(eye)[:, None, None], (3,) + B)

    cp_planar = closest_fn.planar_fn
    an_planar = any_fn.planar_fn

    # ---- primary ----------------------------------------------------------
    meta, _, _ = cull_h(o3, d3)
    hist("primary", meta)
    res = timed("closest primary", jax.jit(cp_planar), o3, d3)

    # ---- bounce rays (cosine at hits; dead lanes parked) -----------------
    rng = np.random.default_rng(7)
    hitm = np.asarray(res.hit)
    t = np.asarray(res.t)
    o_np = np.asarray(o3)
    d_np = np.asarray(d3)
    hp = o_np + np.where(hitm[None], t[None], 0.0) * d_np
    n = np.asarray(res.attrs["normal"]) if res.attrs and "normal" in res.attrs else None
    if n is None:
        # fall back: gather normals by tid
        n = np.asarray(scene.normal)[np.asarray(res.tid)].transpose(2, 0, 1)
    nn = n / np.maximum(np.linalg.norm(n, axis=0), 1e-9)
    # cosine sample around normal
    u1 = rng.random(B).astype(np.float32)
    u2 = rng.random(B).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    # build tangent frame
    a = np.where(np.abs(nn[2]) < 0.9, np.array([0, 0, 1.0])[:, None, None],
                 np.array([0, 1.0, 0])[:, None, None]).astype(np.float32)
    tgt = np.cross(a, nn, axis=0)
    tgt /= np.maximum(np.linalg.norm(tgt, axis=0), 1e-9)
    btg = np.cross(nn, tgt, axis=0)
    bd = (tgt * (r * np.cos(phi))[None] + btg * (r * np.sin(phi))[None]
          + nn * np.sqrt(np.maximum(1 - u1, 0.0))[None]).astype(np.float32)
    bo = (hp + 1e-3 * nn).astype(np.float32)
    # park dead lanes far away pointing +x (integrator parks dead lanes)
    park_o = np.array([1e7, 1e7, 1e7], np.float32)[:, None, None]
    bo = np.where(hitm[None], bo, park_o)
    bd = np.where(hitm[None], bd, np.array([1, 0, 0], np.float32)[:, None, None])
    bo_j, bd_j = jnp.asarray(bo), jnp.asarray(bd)

    meta, _, _ = cull_h(bo_j, bd_j)
    hist("bounce/unsorted", meta)
    timed("closest bounce/unsorted", jax.jit(cp_planar), bo_j, bd_j)

    # integrator's spatial key: dead << 18 | octant << 15 | morton(15b)
    wmin = np.asarray(scene.world_min)
    wext = np.maximum(np.asarray(scene.world_max) - wmin, 1e-6)

    def part1by2(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    def skey(o, d, live):
        dead = (~live).astype(np.int32)
        octant = ((d[0] < 0).astype(np.int32)
                  | ((d[1] < 0).astype(np.int32) << 1)
                  | ((d[2] < 0).astype(np.int32) << 2))
        morton = np.zeros(o.shape[1:], np.int32)
        for ax in range(3):
            q = np.clip((o[ax] - wmin[ax]) / wext[ax] * 32.0, 0, 31).astype(np.int32)
            morton |= part1by2(q) << ax
        return (dead << 18) | (octant << 15) | morton

    k_b = jnp.asarray(skey(bo, bd, hitm))
    bo_s, bd_s = sort_rows(k_b, [bo_j, bd_j])
    meta, _, _ = cull_h(bo_s, bd_s)
    hist("bounce/sorted", meta)
    timed("closest bounce/sorted", jax.jit(cp_planar), bo_s, bd_s)

    # ---- shadow rays (NEE to random light points) ------------------------
    ke = np.asarray(scene.ke)
    lids = np.flatnonzero(ke.max(axis=1) > 0)
    v0 = np.asarray(scene.tri_v0)[lids]
    e1 = np.asarray(scene.tri_v1)[lids] - v0
    e2 = np.asarray(scene.tri_v2)[lids] - v0
    pick = rng.integers(0, len(lids), B)
    su, sv = rng.random(B).astype(np.float32), rng.random(B).astype(np.float32)
    flip = su + sv > 1
    su = np.where(flip, 1 - su, su)
    sv = np.where(flip, 1 - sv, sv)
    lp = (v0[pick].transpose(2, 0, 1) + su[None] * e1[pick].transpose(2, 0, 1)
          + sv[None] * e2[pick].transpose(2, 0, 1)).astype(np.float32)
    so = np.where(hitm[None], hp + 1e-3 * nn, park_o).astype(np.float32)
    svec = lp - so
    dist = np.linalg.norm(svec, axis=0).astype(np.float32)
    sd = (svec / np.maximum(dist[None], 1e-9)).astype(np.float32)
    sd = np.where(hitm[None], sd, np.array([1, 0, 0], np.float32)[:, None, None])
    stmax = np.where(hitm, dist * (1 - 1e-3), 0.0).astype(np.float32)
    excl = jnp.asarray(np.where(hitm, lids[pick], -1).astype(np.int32))
    so_j, sd_j, st_j = jnp.asarray(so), jnp.asarray(sd), jnp.asarray(stmax)

    meta, _, _ = cull_h_tmax(so_j, sd_j, st_j)
    hist("shadow/unsorted", meta)
    timed("any shadow/unsorted", jax.jit(an_planar), so_j, sd_j, st_j, excl)

    # sort shadow rows by (dead, light id, origin cell)
    morton = skey(so, sd, hitm) & 0x7FFF
    kshadow = jnp.asarray(
        ((~hitm).astype(np.int32) << 25) | (pick.astype(np.int32) << 15)
        | morton)
    so_s, sd_s, st_s, ex_s = sort_rows(
        kshadow, [so_j, sd_j, st_j, excl.astype(jnp.float32)])
    meta, _, _ = cull_h_tmax(so_s, sd_s, st_s)
    hist("shadow/sorted(light,cell)", meta)
    timed("any shadow/sorted", jax.jit(an_planar), so_s, sd_s, st_s,
          ex_s.astype(jnp.int32))


if __name__ == "__main__":
    main()
