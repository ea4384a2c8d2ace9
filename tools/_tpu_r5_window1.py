"""Round-5 consolidated measurement window: nanosuit T/U variants,
nanosuit cull microbench, cornell spp_batch.  Each step prints
immediately so a tunnel wedge mid-run loses only the remaining steps.

Usage: python tools/_tpu_r5_window1.py [nano|nanocull|cornell ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def _nanosuit_scene():
    from chiaroscuro_tpu.scene.config import RenderConfig
    from chiaroscuro_tpu.scene.scene_arrays import load_scene

    cfg = RenderConfig.from_rtc(
        "/root/reference/nanosuit.rtc",
        ["xres", "1024", "yres", "1024", "samples", "1", "k", "3"])
    cfg.obj_path = os.path.join("/root/reference", cfg.obj_path)
    scene = load_scene(cfg)
    cam = {"eye": cfg.vp, "center": cfg.la, "up": cfg.up,
           "yview": cfg.yview}
    return scene, cam


def nano():
    from chiaroscuro_tpu.accel.clusters import build_clusters
    from chiaroscuro_tpu.ops.cluster_pallas import make_cluster_intersectors
    from chiaroscuro_tpu.render.renderer import render_samples

    scene, cam = _nanosuit_scene()
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    ys, xs = np.meshgrid(np.arange(1024, dtype=np.int32),
                         np.arange(1024, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    eye = np.asarray(cam["eye"], np.float32)
    center = np.asarray(cam["center"], np.float32)
    up = np.asarray(cam["up"], np.float32)

    for T, U in ((False, 1), (True, 8), (True, 4), (False, 8)):
        cf, af = make_cluster_intersectors(
            scene, clusters=ca, interpret=False, visit_t=T, visit_u=U)
        bufs = cf.derive_buffers(scene)

        @jax.jit
        def frame(scene, bufs, s):
            c2, a2 = cf.bind_buffers(bufs)
            return render_samples(
                scene, eye, center, up, float(cam["yview"]),
                1024, 1024, px, py, s, 1, np.uint32(0), 3,
                np.zeros(3, np.float32), c2, a2, with_stats=True)

        t0 = time.perf_counter()
        _, st = frame(scene, bufs, jnp.int32(0))
        _sync(st)
        c = time.perf_counter() - t0
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            _, st = frame(scene, bufs, jnp.int32(i + 1))
            _sync(st)
            ts.append(time.perf_counter() - t0)
        print(f"nanosuit T={int(T)} U={U}: compile {c:5.1f}s  "
              f"frame {min(ts) * 1e3:7.1f} ms", flush=True)


def nanocull():
    from chiaroscuro_tpu.accel.clusters import build_clusters
    from chiaroscuro_tpu.geometry.camera import (
        camera_basis, primary_ray_dirs_planar,
    )
    from chiaroscuro_tpu.ops import cluster_pallas as cp

    scene, cam = _nanosuit_scene()
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    bmin, bmax = np.asarray(ca.bbox_min), np.asarray(ca.bbox_max)
    eye = np.asarray(cam["eye"], np.float32)
    lu, dx, dy = camera_basis(
        jnp.asarray(eye), jnp.asarray(cam["center"], jnp.float32),
        jnp.asarray(cam["up"], jnp.float32), cam["yview"], 1024, 1024)
    ys, xs = np.meshgrid(np.arange(1024, dtype=np.int32),
                         np.arange(1024, dtype=np.int32), indexing="ij")
    B = (1024 * 1024 // 128, 128)
    z = jnp.zeros(B, jnp.float32)
    d3 = primary_ray_dirs_planar(
        lu, dx, dy, jnp.asarray(xs.reshape(B), jnp.float32),
        jnp.asarray(ys.reshape(B), jnp.float32), z, z)
    o3 = jax.device_put(jnp.asarray(jnp.broadcast_to(
        jnp.asarray(eye)[:, None, None], (3,) + B)))
    d3 = jax.device_put(d3)

    @jax.jit
    def slab_only(o3, d3):
        rh, entry = cp._rowhit_scan(o3, cp._safe_inv(d3), bmin, bmax, None,
                                    with_near=True)
        return jnp.sum(rh) + jnp.sum(entry)

    @jax.jit
    def cull_full(o3, d3):
        m, i, n, c = cp._cull_rows(o3, d3, bmin, bmax, 512)
        return jnp.sum(m) + jnp.sum(n) + jnp.sum(c)

    for name, fn in (("slab only", slab_only), ("full cull", cull_full)):
        t0 = time.perf_counter()
        out = fn(o3, d3)
        _sync(out)
        c = time.perf_counter() - t0
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(o3, d3)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"nanosuit {name} (8192 rows x K=149): compile {c:4.1f}s  "
              f"best {min(ts) * 1e3:7.2f} ms", flush=True)


def cornell():
    from bench import _cornell, _frame_fn

    scene, cam = _cornell()
    for sb in (16, 4, 1):
        frame = _frame_fn(scene, cam, "pallas", 512, 512, 16, 3,
                          spp_batch=sb)
        t0 = time.perf_counter()
        _, st = frame(scene, jnp.int32(0))
        _sync(st)
        c = time.perf_counter() - t0
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            _, st = frame(scene, jnp.int32((i + 1) * 16))
            _sync(st)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        useful = float(st.sum())
        print(f"cornell spp_batch={sb}: compile {c:5.1f}s  "
              f"frame {dt * 1e3:7.1f} ms ({useful / dt / 1e6:.1f} M useful "
              f"rays/s)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for p in (sys.argv[1:] or ["nano", "nanocull", "cornell"]):
        {"nano": nano, "nanocull": nanocull, "cornell": cornell}[p]()
