"""Phase profile of the cluster intersector on nanosuit at the bench
config: cull pass vs top_k compaction vs Pallas visit, plus trip-count
stats.  Feeds docs/ROOFLINE.md."""

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
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene

REF = "/root/reference"


def timed(tag, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<42s} {best * 1e3:8.2f} ms")
    return out, best


def main():
    xres = yres = 1024
    cfg = RenderConfig.from_rtc(
        os.path.join(REF, "nanosuit.rtc"),
        ["xres", str(xres), "yres", str(yres), "k", "3"],
    )
    cfg.obj_path = os.path.join(REF, cfg.obj_path)
    scene = load_scene(cfg)
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1), np.asarray(scene.tri_v2))
    print(f"tris={scene.n_tris} K={ca.K} M={ca.M} "
          f"packed={ca.K * cp.PACK_W * ca.M * 4 / 1e6:.1f} MB")

    # Primary rays at the rtc camera (the real distribution).
    eye = jnp.asarray(cfg.vp, jnp.float32)
    lu, dx, dy = camera_basis(eye, jnp.asarray(cfg.la, jnp.float32),
                              jnp.asarray(cfg.up, jnp.float32),
                              jnp.float32(cfg.yview), xres, yres)
    ys, xs = np.meshgrid(np.arange(yres), np.arange(xres), indexing="ij")
    B0 = xres * yres // 128
    pxf = jnp.asarray(xs.reshape(B0, 128), jnp.float32)
    pyf = jnp.asarray(ys.reshape(B0, 128), jnp.float32)
    z = jnp.zeros_like(pxf)
    d3 = primary_ray_dirs_planar(lu, dx, dy, pxf, pyf, z, z)
    o3 = jnp.broadcast_to(eye[:, None, None], (3, B0, 128))

    Lmax = 128

    @jax.jit
    def cull(o3, d3):
        return cp._cull_rows(o3, d3, jnp.asarray(ca.bbox_min), jnp.asarray(ca.bbox_max), Lmax)

    (meta, ids), t_cull = timed("cull (slab tests + top_k)", cull, o3, d3)
    trips = np.asarray(meta[:, 0])
    print(f"  trip counts: mean={trips.mean():.2f} p50={np.median(trips):.0f} "
          f"p90={np.percentile(trips, 90):.0f} max={trips.max()} "
          f"overflow={int(np.asarray(meta[:, 1]).sum())}/{B0}")

    # Cull without the top_k: isolate compaction cost.
    @jax.jit
    def cull_nocompact(o3, d3):
        K = jnp.asarray(ca.bbox_min).shape[0]
        inv = []
        for a in range(3):
            d = d3[a]
            mag = jnp.abs(d)
            capped = jnp.where(mag * cp.HUGE_INV >= 1.0,
                               1.0 / jnp.where(mag > 0, d, 1.0), cp.HUGE_INV)
            inv.append(jnp.where(d < 0, -jnp.abs(capped), jnp.abs(capped)))
        CK = 32
        Kp = -(-K // CK) * CK
        pad = Kp - K
        bmn = jnp.concatenate([jnp.asarray(ca.bbox_min), jnp.full((pad, 3), cp.BIG)]) if pad else jnp.asarray(ca.bbox_min)
        bmx = jnp.concatenate([jnp.asarray(ca.bbox_max), jnp.full((pad, 3), -cp.BIG)]) if pad else jnp.asarray(ca.bbox_max)

        def chunk_hit(_, boxes):
            cmn, cmx = boxes
            near = far = None
            for a in range(3):
                t0 = (cmn[:, a][:, None, None] - o3[a][None]) * inv[a][None]
                t1 = (cmx[:, a][:, None, None] - o3[a][None]) * inv[a][None]
                lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                near = lo if near is None else jnp.maximum(near, lo)
                far = hi if far is None else jnp.minimum(far, hi)
            hit = (far >= near) & (far >= 0.0)
            return _, jnp.any(hit, axis=2)

        _, rh = jax.lax.scan(
            chunk_hit, 0, (bmn.reshape(-1, CK, 3), bmx.reshape(-1, CK, 3)))
        return rh.reshape(Kp, -1).T[:, :K].sum(axis=1)

    timed("cull slab tests only (no top_k)", cull_nocompact, o3, d3)

    # Full closest / any.
    closest_fn, any_fn = cp.make_cluster_intersectors(
        scene, interpret=False, clusters=ca)

    @jax.jit
    def closest(o3, d3):
        return closest_fn.planar_fn(o3, d3)

    hit, t_closest = timed("closest (cull + visit + attrs)", closest, o3, d3)

    tmax = jnp.where(hit[0] > 0, hit[1] * 0.999, jnp.float32(1e9))
    excl = jnp.full(tmax.shape, jnp.float32(-1))

    @jax.jit
    def anyhit(o3, d3, tmax, excl):
        return any_fn.planar_fn(o3, d3, tmax, excl)

    try:
        timed("any (cull + visit)", anyhit, o3, d3, tmax, excl)
    except Exception as e:
        print("any planar failed:", e)

    print(f"\nsummary: cull {t_cull * 1e3:.1f} ms of closest "
          f"{t_closest * 1e3:.1f} ms "
          f"({100 * t_cull / t_closest:.0f}%)")


if __name__ == "__main__":
    main()
