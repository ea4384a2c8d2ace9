"""Measure nanosuit-scale (19k tris) throughput on TPU: bvh vs pallas-brute."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

from chiaroscuro_tpu.scene.obj_loader import load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.render.renderer import render_samples

method = sys.argv[1] if len(sys.argv) > 1 else "bvh"
xres = yres = int(sys.argv[2]) if len(sys.argv) > 2 else 256
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
depth = 3

scene = build_scene_arrays(load_obj("/root/reference/data/nanosuit.obj"))
print("tris:", scene.n_tris, "textures:", getattr(scene, "tex_atlas", None) is not None, flush=True)

# nanosuit has no emissive faces; add a synthetic area light above it so the
# integrator's NEE path is exercised (shadow rays are half the queries).
ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32), np.arange(xres, dtype=np.int32), indexing="ij")
px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))
eye = jnp.asarray([0.0, 7.0, 12.0], jnp.float32)
center = jnp.asarray([0.0, 7.0, 0.0], jnp.float32)
up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

closest_fn, any_fn = make_intersectors(scene, method)
fr = jax.jit(lambda s, ss: render_samples(
    s, eye, center, up, jnp.float32(1.0), xres, yres, px, py,
    ss, spp, jnp.uint32(0), depth, jnp.zeros(3, jnp.float32),
    closest_fn, any_fn))
t0 = time.time(); out = fr(scene, jnp.int32(0)).block_until_ready()
print(f"[{method}] compile+first: {time.time()-t0:.1f}s  finite={bool(jnp.all(jnp.isfinite(out)))}", flush=True)
ts = []
for i in range(3):
    t0 = time.time(); fr(scene, jnp.int32((i + 1) * spp)).block_until_ready(); ts.append(time.time() - t0)
dt = min(ts)
q = xres * yres * spp * depth * 2
print(f"[{method}] nanosuit {xres}x{yres}@{spp}spp d{depth}: {dt*1e3:.1f} ms -> {q/dt/1e6:.2f} Mray-queries/s", flush=True)
