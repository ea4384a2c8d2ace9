"""Calibrate per-call dispatch/sync latency over the axon tunnel, and
measure pipelined (steady-state) frame throughput vs single-call latency.

The r5 microbenches showed a ~40 ms floor independent of work size
(nanosuit K=149 slab 47.6 ms vs sponza K=3,760 slab 101 ms ~ 0.5 ms/step
+ 40 ms).  If that floor is host-side dispatch + hard-sync round-trip
latency rather than device time, every single-call number this round is
inflated by it, and steady-state throughput (N enqueued frames, one final
hard sync) is the honest production metric.

Usage: python tools/_tpu_r5_dispatch.py [empty|cornell|nanosuit ...]
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


def empty():
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jax.device_put(jnp.ones((8, 128)))
    _sync(tiny(x))
    # single-call latency (dispatch + tiny work + hard sync)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(tiny(x))
        ts.append(time.perf_counter() - t0)
    print(f"empty-call single latency: best {min(ts) * 1e3:.2f} ms  "
          f"median {sorted(ts)[5] * 1e3:.2f} ms", flush=True)
    # pipelined: enqueue 50, one sync
    t0 = time.perf_counter()
    y = x
    for _ in range(50):
        y = tiny(y)
    _sync(y)
    print(f"empty-call pipelined (chained x50): "
          f"{(time.perf_counter() - t0) / 50 * 1e3:.3f} ms/call", flush=True)


def _throughput(tag, frame, arg_fn, n=8):
    # warm
    _sync(frame(arg_fn(0)))
    # single-call latency
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _sync(frame(arg_fn(i + 1)))
        ts.append(time.perf_counter() - t0)
    single = min(ts)
    # pipelined: enqueue n independent frames, one hard sync at the end.
    # Total >= true device time of n frames (the final host fetch cannot
    # complete early), so total/n is a sound per-frame throughput bound.
    t0 = time.perf_counter()
    outs = [frame(arg_fn(10 + i)) for i in range(n)]
    for o in outs:
        _sync(o)
    pipe = (time.perf_counter() - t0) / n
    print(f"{tag}: single {single * 1e3:7.1f} ms   "
          f"pipelined x{n} {pipe * 1e3:7.1f} ms/frame", flush=True)
    return single, pipe


def cornell():
    from bench import _cornell, _frame_fn

    scene, cam = _cornell()
    frame = _frame_fn(scene, cam, "pallas", 512, 512, 16, 3)

    def arg(i):
        return jnp.int32(i * 16)

    def call(s):
        img, st = frame(scene, s)
        return st

    _throughput("cornell 512x512@16spp", call, arg)


def nanosuit():
    from chiaroscuro_tpu.scene.config import RenderConfig
    from chiaroscuro_tpu.scene.scene_arrays import load_scene
    from bench import _frame_fn

    cfg = RenderConfig.from_rtc(
        "/root/reference/nanosuit.rtc",
        ["xres", "1024", "yres", "1024", "samples", "1", "k", "3"])
    cfg.obj_path = os.path.join("/root/reference", cfg.obj_path)
    scene = load_scene(cfg)
    cam = {"eye": cfg.vp, "center": cfg.la, "up": cfg.up,
           "yview": cfg.yview}
    frame = _frame_fn(scene, cam, "cluster", 1024, 1024, 1, 3)

    def arg(i):
        return jnp.int32(i)

    def call(s):
        img, st = frame(scene, s)
        return st

    _throughput("nanosuit 1024x1024@1spp", call, arg)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for p in (sys.argv[1:] or ["empty", "cornell", "nanosuit"]):
        {"empty": empty, "cornell": cornell, "nanosuit": nanosuit}[p]()
