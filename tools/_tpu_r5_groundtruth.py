"""Round-5 ask #1: re-establish the hard-synced forward-perf ground truth.

The r3->r4 deltas (nanosuit 235 -> 310 ms, cornell_16spp 94.7 -> 119 ms)
are confounded by two simultaneous r4 changes: the timing fix (hard sync vs
async barrier) and the bind_scene refactor (intersector buffers derived
in-graph from the traced scene argument instead of baked host constants).
This tool separates them by measuring, all hard-synced on the same chip:

- variant "arg"  : scene passed as a traced jit argument (bench behavior
                   since r4) -> per-frame in-graph buffer derivation;
- variant "const": scene closed over as a concrete pytree -> bind_scene
                   derives *host numpy* constants at trace time, zero
                   per-frame derive work (r3 bench behavior, now hard-synced).

Usage: python tools/_tpu_r5_groundtruth.py [cornell|nanosuit ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.render.renderer import render_samples


def _sync(x):
    jax.block_until_ready(x)
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0]).ravel()[:1]
    return x


def bench_frame(tag, scene, cam, intersector, xres, yres, spp, depth,
                variant, iters=4):
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    eye = np.asarray(cam["eye"], np.float32)
    center = np.asarray(cam["center"], np.float32)
    up = np.asarray(cam["up"], np.float32)
    closest_fn, any_fn = make_intersectors(scene, intersector)

    if variant == "arg":
        @jax.jit
        def frame(scene, sample_start):
            return render_samples(
                scene, eye, center, up, float(cam["yview"]),
                xres, yres, px, py, sample_start, spp, np.uint32(0), depth,
                np.zeros(3, np.float32), closest_fn, any_fn, with_stats=True,
            )

        call = lambda s: frame(scene, jnp.int32(s))
    elif variant == "bufarg":  # buffers derived once, passed as jit args
        bufs = closest_fn.derive_buffers(scene)

        @jax.jit
        def frame(scene, bufs, sample_start):
            cf, af = closest_fn.bind_buffers(bufs)
            return render_samples(
                scene, eye, center, up, float(cam["yview"]),
                xres, yres, px, py, sample_start, spp, np.uint32(0), depth,
                np.zeros(3, np.float32), cf, af, with_stats=True,
            )

        call = lambda s: frame(scene, bufs, jnp.int32(s))
    else:  # const: scene closed over -> host-constant buffers
        @jax.jit
        def frame(sample_start):
            return render_samples(
                scene, eye, center, up, float(cam["yview"]),
                xres, yres, px, py, sample_start, spp, np.uint32(0), depth,
                np.zeros(3, np.float32), closest_fn, any_fn, with_stats=True,
            )

        call = lambda s: frame(jnp.int32(s))

    t0 = time.perf_counter()
    _, stats = call(0)
    _sync(stats)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _, stats = call((i + 1) * spp)
        _sync(stats)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    useful = float(stats.sum())
    print(f"{tag:<28s} {variant:<6s} compile {compile_s:6.1f}s  "
          f"frame {dt * 1e3:8.2f} ms  ({useful / dt / 1e6:.1f} M useful "
          f"rays/s)  all_times={['%.1f' % (t * 1e3) for t in times]}",
          flush=True)
    return dt


def cornell():
    from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
    from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays

    scene = build_scene_arrays(cornell_box())
    for variant in ("arg", "const", "bufarg"):
        bench_frame("cornell 512x512@16spp", scene, CORNELL_CAMERA, "pallas",
                    512, 512, 16, 3, variant)


def nanosuit():
    from chiaroscuro_tpu.scene.config import RenderConfig
    from chiaroscuro_tpu.scene.scene_arrays import load_scene

    rtc = os.path.join("/root/reference", "nanosuit.rtc")
    cfg = RenderConfig.from_rtc(
        rtc, ["xres", "1024", "yres", "1024", "samples", "1", "k", "3"])
    cfg.obj_path = os.path.join("/root/reference", cfg.obj_path)
    scene = load_scene(cfg)
    cam = {"eye": cfg.vp, "center": cfg.la, "up": cfg.up, "yview": cfg.yview}
    for variant in ("arg", "const", "bufarg"):
        bench_frame("nanosuit 1024x1024@1spp", scene, cam, "cluster",
                    1024, 1024, 1, 3, variant)


if __name__ == "__main__":
    parts = sys.argv[1:] or ["cornell", "nanosuit"]
    print(f"devices: {jax.devices()}", flush=True)
    for p in parts:
        {"cornell": cornell, "nanosuit": nanosuit}[p]()
