import sys, time
import numpy as np, jax, jax.numpy as jnp
from chiaroscuro_tpu.scene.obj_loader import load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.ops.cluster_pallas import make_cluster_intersectors
from chiaroscuro_tpu.render.renderer import render_samples

M = int(sys.argv[1]); Lmax = int(sys.argv[2])
scene = build_scene_arrays(load_obj("/root/reference/data/nanosuit.obj"))
xres = yres = 256; spp = 4; depth = 3
ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32), np.arange(xres, dtype=np.int32), indexing="ij")
px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))
eye = jnp.asarray([0.0, 7.0, 12.0], jnp.float32); center = jnp.asarray([0.0, 7.0, 0.0], jnp.float32)
up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
cf, af = make_cluster_intersectors(scene, M=M, Lmax=Lmax)
fr = jax.jit(lambda s, ss: render_samples(s, eye, center, up, jnp.float32(1.0), xres, yres, px, py,
    ss, spp, jnp.uint32(0), depth, jnp.zeros(3, jnp.float32), cf, af))
fr(scene, jnp.int32(0)).block_until_ready()
ts = []
for i in range(3):
    t0 = time.time(); fr(scene, jnp.int32((i+1)*spp)).block_until_ready(); ts.append(time.time()-t0)
q = xres*yres*spp*depth*2
print(f"M={M} Lmax={Lmax}: {min(ts)*1e3:.1f} ms -> {q/min(ts)/1e6:.2f} Mq/s", flush=True)
