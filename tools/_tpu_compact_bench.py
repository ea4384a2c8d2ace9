"""Measure bounce-ray compaction on nanosuit + cornell (VERDICT r2 item 2)."""
import os, sys, time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import chiaroscuro_tpu.render.integrator as integrator
import chiaroscuro_tpu.render.renderer as renderer_mod
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene, build_scene_arrays
from chiaroscuro_tpu.scene.builtin import cornell_box, CORNELL_CAMERA
from chiaroscuro_tpu.accel import make_intersectors

def bench(tag, scene, cam, intersector, xres, yres, spp, depth, compact):
    renderer_mod.trace_paths_planar = partial(
        integrator.trace_paths_planar, compact=compact)
    cf, af = make_intersectors(scene, intersector)
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    eye = np.asarray(cam["eye"], np.float32)
    ce = np.asarray(cam["center"], np.float32)
    up = np.asarray(cam["up"], np.float32)

    @jax.jit
    def frame(scene, s0):
        return render_samples(scene, eye, ce, up, float(cam["yview"]),
                              xres, yres, px, py, s0, spp, np.uint32(0),
                              depth, np.zeros(3, np.float32), cf, af,
                              with_stats=True)
    t0 = time.perf_counter()
    _, stats = frame(scene, jnp.int32(0))
    jax.block_until_ready(stats)
    comp = time.perf_counter() - t0
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _, stats = frame(scene, jnp.int32((i+1)*spp))
        jax.block_until_ready(stats)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    useful = float(stats.sum())
    issued = xres*yres*spp*depth*2
    print(f"[{tag} compact={compact}] {dt*1e3:.1f} ms  "
          f"{useful/dt/1e6:.1f} Mray/s useful ({issued/dt/1e6:.1f} issued, "
          f"occ {100*useful/issued:.0f}%)  compile {comp:.1f}s", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "nanosuit"
if which == "nanosuit":
    cfg = RenderConfig.from_rtc("/root/reference/nanosuit.rtc",
        ["xres", "1024", "yres", "1024", "samples", "1", "k", "3"])
    cfg.obj_path = os.path.join("/root/reference", cfg.obj_path)
    scene = load_scene(cfg)
    cam = {"eye": cfg.vp, "center": cfg.la, "up": cfg.up, "yview": cfg.yview}
    for compact in (False, True):
        bench("nanosuit/cluster", scene, cam, "cluster", 1024, 1024, 1, 3, compact)
else:
    scene = build_scene_arrays(cornell_box())
    for compact in (False, True):
        bench("cornell/pallas", scene, CORNELL_CAMERA, "pallas", 512, 512, 16, 3, compact)
