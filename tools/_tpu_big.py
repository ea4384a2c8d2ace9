"""Sponza-scale synthetic test: tessellated cornell box (~260k tris)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from chiaroscuro_tpu.scene.builtin import cornell_box, CORNELL_CAMERA as cam
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.scene.obj_loader import Mesh
from chiaroscuro_tpu.ops.cluster_pallas import make_cluster_intersectors
from chiaroscuro_tpu.render.renderer import render_samples

def tessellate(mesh, levels):
    """Subdivide each triangle 4^levels times (midpoint subdivision)."""
    pos = mesh.positions[mesh.indices.reshape(-1)].reshape(-1, 3, 3)
    for _ in range(levels):
        v0, v1, v2 = pos[:, 0], pos[:, 1], pos[:, 2]
        m01, m12, m20 = (v0+v1)/2, (v1+v2)/2, (v2+v0)/2
        pos = np.concatenate([
            np.stack([v0, m01, m20], 1), np.stack([m01, v1, m12], 1),
            np.stack([m20, m12, v2], 1), np.stack([m01, m12, m20], 1)])
    T = len(pos)
    import dataclasses
    return dataclasses.replace(
        mesh, positions=pos.reshape(-1, 3).astype(np.float32),
        normals=np.repeat(mesh.normals[:1], 3*T, axis=0).astype(np.float32),
        uvs=np.zeros((3*T, 2), np.float32),
        indices=np.arange(3*T, dtype=np.int32).reshape(-1, 3))

levels = int(sys.argv[1]) if len(sys.argv) > 1 else 6
meshes = [tessellate(m, levels if not m.is_light else 0) for m in cornell_box()]
scene = build_scene_arrays(meshes)
print("tris:", scene.n_tris, flush=True)

xres = yres = 256; spp = 4; depth = 3
ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32), np.arange(xres, dtype=np.int32), indexing="ij")
px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))
eye = jnp.asarray(cam["eye"], jnp.float32); center = jnp.asarray(cam["center"], jnp.float32)
up = jnp.asarray(cam["up"], jnp.float32)
t0 = time.time()
cf, af = make_cluster_intersectors(scene, M=128, Lmax=128)
print("build:", round(time.time()-t0, 2), "s", flush=True)
fr = jax.jit(lambda s, ss: render_samples(s, eye, center, up, jnp.float32(cam["yview"]), xres, yres, px, py,
    ss, spp, jnp.uint32(0), depth, jnp.zeros(3, jnp.float32), cf, af))
t0 = time.time(); out = fr(scene, jnp.int32(0)).block_until_ready()
print(f"compile+first: {time.time()-t0:.1f}s finite={bool(jnp.all(jnp.isfinite(out)))}", flush=True)
ts = []
for i in range(3):
    t0 = time.time(); fr(scene, jnp.int32((i+1)*spp)).block_until_ready(); ts.append(time.time()-t0)
q = xres*yres*spp*depth*2
print(f"tessellated-cornell {scene.n_tris} tris {xres}x{yres}@{spp}spp d{depth}: {min(ts)*1e3:.1f} ms -> {q/min(ts)/1e6:.2f} Mq/s", flush=True)
