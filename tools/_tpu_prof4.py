import time, numpy as np, jax, jax.numpy as jnp
from chiaroscuro_tpu.scene.obj_loader import load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.clusters import build_clusters
import chiaroscuro_tpu.ops.cluster_pallas as cp

scene = build_scene_arrays(load_obj("/root/reference/data/nanosuit.obj"))
ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1), np.asarray(scene.tri_v2), 128)
cf, af = cp.make_cluster_intersectors(scene, M=128, Lmax=64, clusters=ca)
bmin, bmax = jnp.asarray(ca.bbox_min), jnp.asarray(ca.bbox_max)

R = 256*256
rng = np.random.default_rng(0)
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)

def planarize(o, d):
    return jnp.asarray(np.ascontiguousarray(o.T).reshape(3,-1,128)), jnp.asarray(np.ascontiguousarray(d.T).reshape(3,-1,128))

# realistic primary rays: pinhole camera grid (coherent rows)
eye = np.array([0.0, 7.0, 12.0], np.float32)
xs, ys = np.meshgrid(np.linspace(-0.5,0.5,256), np.linspace(-0.9,0.1,256))
d = np.stack([xs.ravel(), -ys.ravel(), -np.ones(R)], axis=1).astype(np.float32)
o = np.broadcast_to(eye, (R,3)).astype(np.float32)
o3c, d3c = planarize(o, d)

# incoherent: origins on surface-ish, random dirs
o2 = rng.uniform(lo, hi, (R,3)).astype(np.float32)
d2 = rng.normal(size=(R,3)).astype(np.float32)
o3i, d3i = planarize(o2, d2)

def timed(name, fn, *args, n=10):
    f = jax.jit(lambda *a: jax.lax.scan(lambda c, _: (jax.tree.map(lambda x: x, c), fn(*a)[0].sum() if isinstance(fn(*a), tuple) else fn(*a).sum()), 0.0, None, length=n)[1].sum())
    # simpler: build scan manually
    pass

def bench_scan(fn, args, n=10):
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

cull = lambda o3, d3: cp._cull_rows(o3, d3, bmin, bmax, 64)
m_c = bench_scan(cull, (o3c, d3c))
m_i = bench_scan(cull, (o3i, d3i))
print(f"cull/query: coherent {m_c:.2f} ms, incoherent {m_i:.2f} ms", flush=True)

meta_c, _ = jax.jit(cull)(o3c, d3c)
print("coherent trip mean/max:", np.asarray(meta_c[:,0]).mean(), np.asarray(meta_c[:,0]).max(),
      "overflow:", np.asarray(meta_c[:,1]).mean(), flush=True)

k_c = bench_scan(lambda o3, d3: cf.planar_fn(o3, d3).t, (o3c, d3c))
k_i = bench_scan(lambda o3, d3: cf.planar_fn(o3, d3).t, (o3i, d3i))
print(f"closest/query: coherent {k_c:.2f} ms ({R/k_c*1e3/1e6:.1f} Mq/s), incoherent {k_i:.2f} ms ({R/k_i*1e3/1e6:.1f} Mq/s)", flush=True)
