"""Bisect the cornell 512x512 compile-time regression (VERDICT r2 item 3).

Times trace+lower and XLA compile separately for the exact bench frame
function under feature toggles. Run variants one at a time:

    python tools/_tpu_compile_bisect.py <variant>

variants: full | nostats | brute | spp1 | spp4 | depth1 | pallas-nostats
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


def run(variant):
    spp = 16
    depth = 3
    intersector = "auto"
    with_stats = True
    if variant == "nostats":
        with_stats = False
    elif variant == "brute":
        intersector = "brute"
    elif variant == "spp1":
        spp = 1
    elif variant == "spp4":
        spp = 4
    elif variant == "depth1":
        depth = 1
    elif variant == "pallas-nostats":
        with_stats = False

    xres = yres = 512
    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    closest_fn, any_fn = make_intersectors(scene, intersector)
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    host_consts = bool(int(os.environ.get("BISECT_HOST_CONSTS", "0")))
    arr = np.asarray if host_consts else jnp.asarray
    px = arr(xs.reshape(-1))
    py = arr(ys.reshape(-1))
    eye = arr(np.asarray(cam["eye"], np.float32))
    center = arr(np.asarray(cam["center"], np.float32))
    up = arr(np.asarray(cam["up"], np.float32))

    @jax.jit
    def frame(scene, sample_start):
        return render_samples(
            scene, eye, center, up, jnp.float32(cam["yview"]),
            xres, yres, px, py, sample_start, spp, jnp.uint32(0), depth,
            jnp.zeros(3, jnp.float32), closest_fn, any_fn,
            with_stats=with_stats,
        )

    import faulthandler
    if os.environ.get("BISECT_DUMP"):
        faulthandler.dump_traceback_later(20, repeat=True)
    t0 = time.perf_counter()
    lowered = frame.lower(scene, jnp.int32(0))
    t_lower = time.perf_counter() - t0
    faulthandler.cancel_dump_traceback_later()
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(scene, jnp.int32(0))
    jax.block_until_ready(out)
    t_run = time.perf_counter() - t0
    print(f"[{variant}] spp={spp} depth={depth} intersector={intersector} "
          f"stats={with_stats}: lower={t_lower:.2f}s compile={t_compile:.2f}s "
          f"first_run={t_run:.2f}s", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "full")
