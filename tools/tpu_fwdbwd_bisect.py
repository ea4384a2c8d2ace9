"""Bisect the round-3 cornell fwd+bwd regression (9.6 s -> 18.2 s at
512x512 @ 500 spp) on-chip: time the gradient step under the dense-pallas
intersector with round-3 features individually disabled.

Usage: python tools/tpu_fwdbwd_bisect.py [spp] [variant ...]
Variants: head, nolive, nopark (default: all).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


def run(variant, spp=100, xres=512, yres=512, depth=3):
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
        closest_fn, any_fn = make_intersectors(s, "pallas")
        if variant == "nolive":
            # strip the live-hint capability: integrator falls back to
            # always-on tiles (round-2 behavior)
            closest_fn.accepts_live = False
            any_fn.accepts_live = False
        img = render_samples(
            s, eye, center, up, float(cam["yview"]),
            xres, yres, px, py, sample_start, spp, np.uint32(0), depth,
            np.zeros(3, np.float32), closest_fn, any_fn, remat=True,
        )
        return jnp.mean(img)

    params = {"kd": scene.kd, "ke": scene.ke}
    grad_fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    l, g = grad_fn(params, scene, jnp.int32(0))
    jax.block_until_ready((l, g))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        l, g = grad_fn(params, scene, jnp.int32((i + 1) * spp))
        jax.block_until_ready((l, g))
        best = min(best, time.perf_counter() - t0)
    print(f"[{variant}] fwdbwd {spp}spp: {best * 1e3:.0f} ms "
          f"(compile {compile_s:.1f}s, loss={float(l):.4f})", flush=True)


if __name__ == "__main__":
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    variants = sys.argv[2:] or ["head", "nolive"]
    for v in variants:
        run(v, spp)
