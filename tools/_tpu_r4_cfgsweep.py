"""Round-4 (Lsup, Le) selection on the 480k-tri atrium with the K2 sort key
(octant | 4x4 direction bins | morton5): cull histograms + timed cull +
timed closest kernel on the sorted bounce wavefront, and timed any on the
(light, cell)-sorted shadow wavefront.  Picks the production defaults.
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
    print(f"    [{tag:<18s}] p50={np.percentile(t, 50):5.0f} "
          f"p90={np.percentile(t, 90):5.0f} sum={t.sum()/1e6:6.2f}M "
          f"ovf={100*ov.mean():5.1f}%", flush=True)


def timed(tag, fn, *args, iters=2):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"    {tag:<30s} compile {c:6.1f}s  run {best*1e3:9.1f} ms",
          flush=True)
    return out


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
    base_closest, _ = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False, stream=True, hier=True)
    res = jax.block_until_ready(base_closest.planar_fn(o3, d3))

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

    def morton(o):
        m = np.zeros(o.shape[1:], np.int64)
        for ax in range(3):
            q = np.clip((o[ax] - wmin[ax]) / wext[ax] * 32, 0,
                        31).astype(np.int64)
            m |= part1by2(q) << ax
        return m

    def k2key(o, d, live):
        dead = (~live).astype(np.int64)
        octant = ((d[0] < 0).astype(np.int64)
                  | ((d[1] < 0).astype(np.int64) << 1)
                  | ((d[2] < 0).astype(np.int64) << 2))
        s = np.abs(d[0]) + np.abs(d[1]) + np.abs(d[2]) + 1e-9
        b1 = np.clip(np.abs(d[0]) / s * 4, 0, 3).astype(np.int64)
        b2 = np.clip(np.abs(d[1]) / s * 4, 0, 3).astype(np.int64)
        return (dead << 22) | (octant << 19) | (((b1 << 2) | b2) << 15) \
            | morton(o)

    order = np.argsort(k2key(bo, bd, hitm).reshape(-1), kind="stable")
    bo_s = jnp.asarray(bo.reshape(3, -1)[:, order].reshape((3,) + B))
    bd_s = jnp.asarray(bd.reshape(3, -1)[:, order].reshape((3,) + B))

    # shadow wavefront sorted by (light, cell)
    ke = np.asarray(scene.ke)
    lids = np.flatnonzero(ke.max(axis=1) > 0)
    v0 = np.asarray(scene.tri_v0)[lids]
    e1 = np.asarray(scene.tri_v1)[lids] - v0
    e2 = np.asarray(scene.tri_v2)[lids] - v0
    pick = rng.integers(0, len(lids), B)
    su = rng.random(B).astype(np.float32)
    sv = rng.random(B).astype(np.float32)
    flip = su + sv > 1
    su = np.where(flip, 1 - su, su)
    sv = np.where(flip, 1 - sv, sv)
    lp = (v0[pick].transpose(2, 0, 1) + su[None] * e1[pick].transpose(2, 0, 1)
          + sv[None] * e2[pick].transpose(2, 0, 1)).astype(np.float32)
    so = np.where(hitm[None], hp + 1e-3 * nn, park_o).astype(np.float32)
    svec = lp - so
    dist = np.linalg.norm(svec, axis=0).astype(np.float32)
    sd = (svec / np.maximum(dist[None], 1e-9)).astype(np.float32)
    sd = np.where(hitm[None], sd,
                  np.array([1, 0, 0], np.float32)[:, None, None])
    stmax = np.where(hitm, dist * (1 - 1e-3), 0.0).astype(np.float32)
    exnp = np.where(hitm, lids[pick], -1).astype(np.int32)
    skey = (((~hitm).astype(np.int64) << 26)
            | (pick.astype(np.int64) << 16) | morton(so))
    sorder = np.argsort(skey.reshape(-1), kind="stable")

    def srt(x):
        return jnp.asarray(x.reshape(x.shape[:-2] + (-1,))[..., sorder]
                           .reshape(x.shape[:-2] + B))

    so_s, sd_s = srt(so), srt(sd)
    st_s = srt(stmax)
    ex_s = jnp.asarray(exnp.reshape(-1)[sorder].reshape(B))

    for Lsup in (96, 128, 235):
        print(f"Lsup={Lsup} Le=512:", flush=True)
        cf, af = cp.make_cluster_intersectors(
            scene, clusters=ca, interpret=False, stream=True, hier=True,
            Lsup=Lsup, Lmax=512)
        timed(f"closest bounce/sorted", jax.jit(cf.planar_fn), bo_s, bd_s)
        timed(f"any shadow/sorted", jax.jit(af.planar_fn),
              so_s, sd_s, st_s, ex_s)
        timed(f"closest primary", jax.jit(cf.planar_fn), o3, d3)


if __name__ == "__main__":
    main()
