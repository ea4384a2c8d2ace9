import time, numpy as np, jax, jax.numpy as jnp
from chiaroscuro_tpu.scene.obj_loader import load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.clusters import build_clusters
import chiaroscuro_tpu.ops.cluster_pallas as cp

scene = build_scene_arrays(load_obj("/root/reference/data/nanosuit.obj"))
ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1), np.asarray(scene.tri_v2), 128)
bmin, bmax = jnp.asarray(ca.bbox_min), jnp.asarray(ca.bbox_max)
R = 256*256
rng = np.random.default_rng(0)
eye = np.array([0.0, 7.0, 12.0], np.float32)
xs, ys = np.meshgrid(np.linspace(-0.5,0.5,256), np.linspace(-0.9,0.1,256))
d = np.stack([xs.ravel(), -ys.ravel(), -np.ones(R)], axis=1).astype(np.float32)
o = np.broadcast_to(eye, (R,3)).astype(np.float32)
o3 = jnp.asarray(np.ascontiguousarray(o.T).reshape(3,-1,128)); d3 = jnp.asarray(np.ascontiguousarray(d.T).reshape(3,-1,128))

def bench_scan(fn, args, n=20):
    def step(c, _):
        out = fn(*args)
        s = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b).astype(jnp.float32), out, jnp.float32(0))
        return c + s, None
    g = jax.jit(lambda: jax.lax.scan(step, jnp.float32(0), None, length=n)[0])
    g().block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.time(); g().block_until_ready(); ts.append(time.time() - t0)
    return min(ts) / n * 1e3

import functools
def cull_no_topk(o3, d3):
    # replicate _cull_rows up to rowhit
    K = bmin.shape[0]
    near = far = None
    for a in range(3):
        olo = jnp.min(o3[a], axis=1); ohi = jnp.max(o3[a], axis=1)
        dlo = jnp.min(d3[a], axis=1); dhi = jnp.max(d3[a], axis=1)
        definite = (dlo > 0.0) | (dhi < 0.0)
        ilo = 1.0/jnp.where(definite, dhi, 1.0); ihi = 1.0/jnp.where(definite, dlo, 1.0)
        n_lo = bmin[:, a][None, :] - ohi[:, None]; n_hi = bmax[:, a][None, :] - olo[:, None]
        p = [n_lo*ilo[:,None], n_lo*ihi[:,None], n_hi*ilo[:,None], n_hi*ihi[:,None]]
        t_lo = jnp.where(definite[:,None], jnp.minimum(jnp.minimum(p[0],p[1]),jnp.minimum(p[2],p[3])), -cp.BIG)
        t_hi = jnp.where(definite[:,None], jnp.maximum(jnp.maximum(p[0],p[1]),jnp.maximum(p[2],p[3])), cp.BIG)
        near = t_lo if near is None else jnp.maximum(near, t_lo)
        far = t_hi if far is None else jnp.minimum(far, t_hi)
    return (far >= near) & (far >= 0.0)

print("rowhit only:", bench_scan(cull_no_topk, (o3, d3)), "ms", flush=True)
full = lambda o3, d3: cp._cull_rows(o3, d3, bmin, bmax, 64)
print("full cull:", bench_scan(full, (o3, d3)), "ms", flush=True)

floor = lambda o3, d3: (o3[0] + d3[0])
print("floor (1 elementwise op):", bench_scan(floor, (o3, d3)), "ms", flush=True)
redux = lambda o3, d3: (jnp.min(o3[0],axis=1)+jnp.max(d3[0],axis=1))
print("lane reductions:", bench_scan(redux, (o3, d3)), "ms", flush=True)
