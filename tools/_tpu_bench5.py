import time, numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
import chiaroscuro_tpu.ops.intersect_pallas as ip
from chiaroscuro_tpu.scene.builtin import cornell_box, CORNELL_CAMERA as cam
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.sampling import prng
scene = build_scene_arrays(cornell_box())
R = 262144
rng = np.random.default_rng(0)
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
o = jnp.asarray(rng.uniform(lo, hi, (R,3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(R,3)), jnp.float32)
pix = jnp.arange(R, dtype=jnp.uint32)

def timeit(name, fn, iters=20):
    @jax.jit
    def loop():
        def body(i, acc):
            return acc + fn(i)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    jax.block_until_ready(loop())
    ts=[]
    for _ in range(3):
        t0=time.time(); jax.block_until_ready(loop()); ts.append(time.time()-t0)
    print(f'{name}: {min(ts)/iters*1e3:.2f} ms/iter', flush=True)

# RNG cost per sample (keys + jitter + 3 bounces of uniforms) for R rays
def rng_sample(i):
    keys = prng.pixel_sample_keys(jnp.uint32(0), pix, i)
    j = prng.aa_jitter_batch(keys)
    s = jnp.sum(j)
    for k in range(1, 4):
        u = prng.bounce_uniforms_batch(keys, k)
        s = s + jnp.sum(u)
    return s
timeit('rng per sample (jitter + 3 bounces)', rng_sample, iters=5)

# intersection cost per sample (3 closest + 3 any)
closest_fn, any_fn = ip.make_pallas_intersectors(scene)
tm = jnp.full((R,), 500.0); ex = jnp.zeros((R,), jnp.int32)
def isect_sample(i):
    s = jnp.float32(0)
    dd = d + 1e-9*i
    for k in range(3):
        h = closest_fn(o, dd)
        occ = any_fn(o, dd, tm, ex)
        s = s + jnp.sum(h.t) + jnp.sum(occ)
        dd = dd + 1e-12*s
    return s
timeit('intersect per sample (3 closest + 3 any)', isect_sample, iters=5)

# gathers+shading-ish cost: gather scene arrays by random tid
tid = jnp.asarray(rng.integers(0, scene.n_tris, R), jnp.int32)
def shade_like(i):
    t = (tid + i) % scene.n_tris
    v = scene.tri_v0[t] + scene.tri_v1[t]*0.3 + scene.tri_v2[t]*0.2
    n = scene.normal[t]; kd = scene.kd[t]
    return jnp.sum(v) + jnp.sum(n*kd)
timeit('scene gathers per bounce x3', lambda i: shade_like(i)+shade_like(i+1)+shade_like(i+2), iters=20)
