"""Round-5 ask #4: roofline the cornell 500-spp backward pass.

BENCH_r04: forward 2.29 s, fwd+bwd 9.65 s (4.2x) at grad_accum_chunk=100.
With remat the expected cost is ~3x forward (recompute + linear VJPs).
Variants measured here, all hard-synced, per 100-spp chunk:

- head            : r5 head as-is
- onehot          : CHIAROSCURO_BWD_ONEHOT recompute fetch (MXU one-hot
                    matmul instead of TPU generic gathers)
- chunk sweep     : grad_accum_chunk in {50, 100, 250, 500}
- noattr          : zero attr cotangent path cost probe (detach am in the
                    recompute — NOT correct gradients; cost attribution only)

Usage: python tools/_tpu_r5_bwd.py [head|onehot|chunks|noattr ...]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import chiaroscuro_tpu.ops.intersect_pallas as ip
from chiaroscuro_tpu.ops.intersect_pallas import make_pallas_intersectors
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


def _sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def measure(tag, spp_chunk=100, xres=512, yres=512, depth=3):
    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    eye = np.asarray(cam["eye"], np.float32)
    center = np.asarray(cam["center"], np.float32)
    up = np.asarray(cam["up"], np.float32)

    def loss(params, scene, sample_start):
        s = dataclasses.replace(scene, **params)
        cf, af = make_pallas_intersectors(s)
        img = render_samples(
            s, eye, center, up, float(cam["yview"]),
            xres, yres, px, py, sample_start, spp_chunk, np.uint32(0),
            depth, np.zeros(3, np.float32), cf, af, remat=True,
        )
        return jnp.mean(img)

    params = {"kd": scene.kd, "ke": scene.ke}
    grad_fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    l, g = grad_fn(params, scene, jnp.int32(0))
    _sync(g)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        l, g = grad_fn(params, scene, jnp.int32((i + 1) * spp_chunk))
        _sync(g)
        best = min(best, time.perf_counter() - t0)
    per500 = best * (500 / spp_chunk)
    print(f"{tag:<28s} chunk={spp_chunk:<4d} compile {compile_s:6.1f}s  "
          f"{best * 1e3:8.1f} ms/chunk  -> {per500:6.2f} s per 500 spp",
          flush=True)
    return best


def fwd_baseline(spp_chunk=100, xres=512, yres=512, depth=3):
    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    cf, af = make_pallas_intersectors(scene)
    bufs = cf.derive_buffers(scene)

    @jax.jit
    def frame(scene, bufs, s):
        c2, a2 = cf.bind_buffers(bufs)
        return render_samples(
            scene, np.asarray(cam["eye"], np.float32),
            np.asarray(cam["center"], np.float32),
            np.asarray(cam["up"], np.float32), float(cam["yview"]),
            xres, yres, px, py, s, spp_chunk, np.uint32(0), depth,
            np.zeros(3, np.float32), c2, a2,
        )

    _sync(frame(scene, bufs, jnp.int32(0)))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _sync(frame(scene, bufs, jnp.int32((i + 1) * spp_chunk)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'forward (ref)':<28s} chunk={spp_chunk:<4d} "
          f"{'':>16s}  {best * 1e3:8.1f} ms/chunk  -> "
          f"{best * 500 / spp_chunk:6.2f} s per 500 spp", flush=True)


if __name__ == "__main__":
    parts = sys.argv[1:] or ["fwd", "head", "onehot", "chunks"]
    print(f"devices: {jax.devices()}", flush=True)
    for p in parts:
        if p == "fwd":
            fwd_baseline()
        elif p == "head":
            ip._BWD_ONEHOT = False
            measure("head (gather fetch)")
        elif p == "onehot":
            ip._BWD_ONEHOT = True
            measure("onehot fetch")
            ip._BWD_ONEHOT = False
        elif p == "chunks":
            for c in (50, 250, 500):
                measure(f"head chunk={c}", spp_chunk=c)
