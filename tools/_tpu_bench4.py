import time, numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
import chiaroscuro_tpu.ops.intersect_pallas as ip
from chiaroscuro_tpu.scene.builtin import cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.bvh import build_bvh, bvh_closest
from chiaroscuro_tpu.scene.obj_loader import load_obj

scene = build_scene_arrays(cornell_box())
rng = np.random.default_rng(0)
R = 262144
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
o = jnp.asarray(rng.uniform(lo, hi, (R,3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(R,3)), jnp.float32)

K = 50
def bench_loop(name, fn):
    # fn(o, d) -> pytree; chain K invocations inside one jit
    @jax.jit
    def loop(o, d):
        def body(i, carry):
            acc, dd = carry
            h = fn(o, dd)
            # fold result into the dir so iterations can't be CSE'd away
            acc = acc + h[1]  # t values
            dd = dd + 1e-12 * acc[:, None]
            return acc, dd
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros((R,)), d))
        return acc
    r = loop(o, d); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0=time.time(); jax.block_until_ready(loop(o, d)); ts.append(time.time()-t0)
    per = min(ts)/K
    print(f'{name}: {per*1e3:.3f} ms/call, {R/per/1e6:.0f} Mray/s', flush=True)

closest_fn, any_fn = ip.make_pallas_intersectors(scene)
bench_loop('pallas cornell(36 tri)', lambda o, d: closest_fn(o, d))

meshes = load_obj('/root/reference/data/nanosuit.obj')
nscene = build_scene_arrays(meshes)
nlo, nhi = np.asarray(nscene.world_min), np.asarray(nscene.world_max)
no = jnp.asarray(rng.uniform(nlo, nhi, (R,3)), jnp.float32)
nd = jnp.asarray(rng.normal(size=(R,3)), jnp.float32)
bvh = build_bvh(nscene, leaf_size=8)
print('nanosuit bvh nodes:', bvh.n_nodes, flush=True)
def bvh_fn(o, d):
    h = bvh_closest(bvh, o, d)
    return h
@jax.jit
def bvh_loop(o, d):
    def body(i, carry):
        acc, dd = carry
        h = bvh_closest(bvh, o, dd)
        acc = acc + h[1]
        dd = dd + 1e-12 * acc[:, None]
        return acc, dd
    acc, _ = jax.lax.fori_loop(0, 10, body, (jnp.zeros((R,)), d))
    return acc
r = bvh_loop(no, nd); jax.block_until_ready(r)
ts=[]
for _ in range(3):
    t0=time.time(); jax.block_until_ready(bvh_loop(no, nd)); ts.append(time.time()-t0)
per = min(ts)/10
print(f'bvh nanosuit(38k tri): {per*1e3:.2f} ms/call, {R/per/1e6:.1f} Mray/s', flush=True)

# pallas brute on nanosuit for comparison
pclosest, _ = ip.make_pallas_intersectors(nscene)
bench_loop('pallas nanosuit(38k tri, brute)', lambda o, d: pclosest(o, d))
