import time, numpy as np, jax, jax.numpy as jnp
from chiaroscuro_tpu.scene.obj_loader import load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.clusters import build_clusters
import chiaroscuro_tpu.ops.cluster_pallas as cp

scene = build_scene_arrays(load_obj("/root/reference/data/nanosuit.obj"))
ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1), np.asarray(scene.tri_v2), 128)
print("K:", ca.K, "M:", ca.M, "occupancy:", (ca.orig_id < scene.n_tris).mean(), flush=True)
cf, af = cp.make_cluster_intersectors(scene, M=128, Lmax=64, clusters=ca)

R = 256*256
rng = np.random.default_rng(0)
# incoherent rays: origins inside model bbox, random dirs (proxy for bounce rays)
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
o = rng.uniform(lo, hi, (R,3)).astype(np.float32)
d = rng.normal(size=(R,3)).astype(np.float32)
o3 = jnp.asarray(o.T.reshape(3,-1,128)); d3 = jnp.asarray(d.T.reshape(3,-1,128))

bmin, bmax = jnp.asarray(ca.bbox_min), jnp.asarray(ca.bbox_max)
cull = jax.jit(lambda o3, d3: cp._cull_rows(o3, d3, bmin, bmax, 64))
meta, ids = cull(o3, d3); jax.block_until_ready((meta, ids))
tr = np.asarray(meta[:,0]); ofl = np.asarray(meta[:,1])
print(f"incoherent: mean trip {tr.mean():.1f} max {tr.max()} overflow frac {ofl.mean():.3f}", flush=True)
ts=[]
for _ in range(5):
    t0=time.time(); jax.block_until_ready(cull(o3,d3)); ts.append(time.time()-t0)
print(f"cull alone: {min(ts)*1e3:.2f} ms", flush=True)

full = jax.jit(lambda o3,d3: cf.planar_fn(o3,d3).t)
jax.block_until_ready(full(o3,d3))
ts=[]
for _ in range(5):
    t0=time.time(); jax.block_until_ready(full(o3,d3)); ts.append(time.time()-t0)
print(f"cull+kernel closest: {min(ts)*1e3:.2f} ms -> {R/min(ts)/1e6:.1f} Mq/s", flush=True)

# coherent primary-ray proxy: eye outside, dirs towards model
eye = (hi + (hi-lo)*0.8).astype(np.float32)
tgt = rng.uniform(lo, hi, (R,3)).astype(np.float32)
d2 = tgt - eye
o2 = np.broadcast_to(eye, (R,3)).astype(np.float32)
o3b = jnp.asarray(o2.T.reshape(3,-1,128)); d3b = jnp.asarray(np.ascontiguousarray(d2.T).reshape(3,-1,128))
meta2, _ = cull(o3b, d3b)
tr2 = np.asarray(meta2[:,0])
print(f"coherent: mean trip {tr2.mean():.1f} max {tr2.max()}", flush=True)
ts=[]
for _ in range(5):
    t0=time.time(); jax.block_until_ready(full(o3b,d3b)); ts.append(time.time()-t0)
print(f"coherent closest: {min(ts)*1e3:.2f} ms -> {R/min(ts)/1e6:.1f} Mq/s", flush=True)
