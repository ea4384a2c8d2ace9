"""Round-4 nanosuit regression breakdown: compile + runtime of the cluster
path's pieces (cull / ordered-cull / closest kernel / any kernel) and of the
full frame under feature toggles (compact, spatial sort, live hints).

Usage: python tools/_tpu_r4_nanoprof.py [part ...]
Parts: pieces, frame, frame_nocompact, frame_nospatial  (default: all)
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
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene

REF = "/root/reference"
XRES = YRES = 1024


def timed(tag, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<40s} compile {compile_s:7.1f}s   run {best * 1e3:8.2f} ms",
          flush=True)
    return out


def setup():
    cfg = RenderConfig.from_rtc(
        os.path.join(REF, "nanosuit.rtc"),
        ["xres", str(XRES), "yres", str(YRES), "k", "3"],
    )
    cfg.obj_path = os.path.join(REF, cfg.obj_path)
    scene = load_scene(cfg)
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    eye = np.asarray(cfg.vp, np.float32)
    lu, dx, dy = camera_basis(
        jnp.asarray(eye), jnp.asarray(cfg.la, jnp.float32),
        jnp.asarray(cfg.up, jnp.float32), cfg.yview, XRES, YRES)
    ys, xs = np.meshgrid(np.arange(YRES, dtype=np.int32),
                         np.arange(XRES, dtype=np.int32), indexing="ij")
    B = (XRES * YRES // 128, 128)
    pxf = xs.reshape(B).astype(np.float32)
    pyf = ys.reshape(B).astype(np.float32)
    zeros = jnp.zeros(B, jnp.float32)
    d3 = primary_ray_dirs_planar(lu, dx, dy, jnp.asarray(pxf),
                                 jnp.asarray(pyf), zeros, zeros)
    o3 = jnp.broadcast_to(jnp.asarray(eye)[:, None, None], (3,) + B)
    return cfg, scene, ca, o3, d3


def pieces(cfg, scene, ca, o3, d3):
    bmin = np.asarray(ca.bbox_min)
    bmax = np.asarray(ca.bbox_max)
    Le = min(128, ca.K)

    @jax.jit
    def cull(o3, d3):
        return cp._cull_rows(o3, d3, bmin, bmax, 128)

    @jax.jit
    def cull_unordered(o3, d3):
        rowhit, entry = cp._rowhit_scan(
            o3, cp._safe_inv(jax.lax.stop_gradient(d3)), bmin, bmax,
            with_near=True)
        return rowhit.sum(), entry.sum()

    meta, ids, nears = timed("cull (ordered, w/ sort)", cull, o3, d3)
    timed("rowhit scan only (no sort)", cull_unordered, o3, d3)
    trips = np.asarray(meta[:, 0])
    print(f"  trip p50={np.percentile(trips, 50):.0f} "
          f"p90={np.percentile(trips, 90):.0f} max={trips.max()} "
          f"overflow={100 * np.asarray(meta[:, 1]).mean():.2f}%")

    closest_fn, any_fn = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False)
    cp_planar = closest_fn.planar_fn
    an_planar = any_fn.planar_fn

    @jax.jit
    def closest(o3, d3):
        return cp_planar(o3, d3)

    res = timed("closest_planar (cull+kernel)", closest, o3, d3)

    @jax.jit
    def anyq(o3, d3, tmax, excl):
        return an_planar(o3, d3, tmax, excl)

    tmax = jnp.where(res.hit, res.t * 0.9, 1e9)
    excl = jnp.full(o3.shape[1:], -1, jnp.int32)
    timed("any_planar (cull+kernel)", anyq, o3, d3, tmax, excl)


def frame(cfg, scene, ca, tag, **over):
    closest_fn, any_fn = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False)
    for k, v in over.items():
        setattr(closest_fn, k, v)
    eye = np.asarray(cfg.vp, np.float32)
    center = np.asarray(cfg.la, np.float32)
    up = np.asarray(cfg.up, np.float32)
    ys, xs = np.meshgrid(np.arange(YRES, dtype=np.int32),
                         np.arange(XRES, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)

    @jax.jit
    def f(scene, s0):
        return render_samples(
            scene, eye, center, up, float(cfg.yview), XRES, YRES, px, py,
            s0, 1, np.uint32(0), 3, np.zeros(3, np.float32),
            closest_fn, any_fn, with_stats=True)

    timed(tag, f, scene, jnp.int32(0))


if __name__ == "__main__":
    parts = sys.argv[1:] or ["pieces", "frame", "frame_nocompact",
                             "frame_nospatial"]
    s = setup()
    cfg, scene, ca = s[0], s[1], s[2]
    for p in parts:
        if p == "pieces":
            pieces(*s)
        elif p == "frame":
            frame(cfg, scene, ca, "frame (compact+spatial)")
        elif p == "frame_nocompact":
            frame(cfg, scene, ca, "frame (no compaction)",
                  prefers_compaction=False)
        elif p == "frame_nospatial":
            frame(cfg, scene, ca, "frame (compact, no spatial)",
                  prefers_ray_sort=False)
