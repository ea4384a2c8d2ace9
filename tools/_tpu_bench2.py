import time, numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
from chiaroscuro_tpu.scene.builtin import cornell_box
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.dispatch import make_intersectors
scene = build_scene_arrays(cornell_box())
rng = np.random.default_rng(0)
R = 262144
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
o = jnp.asarray(rng.uniform(lo, hi, (R,3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(R,3)), jnp.float32)

for name in ("pallas",):
    closest_fn, any_fn = make_intersectors(scene, name)
    f = jax.jit(lambda o, d: closest_fn(o, d))
    t0=time.time(); r = f(o,d); jax.block_until_ready(r); print(name, 'compile+run', round(time.time()-t0,2), flush=True)
    ts=[]
    for _ in range(5):
        t0=time.time(); r = f(o,d); jax.block_until_ready(r); ts.append(time.time()-t0)
    dt=min(ts)
    print(name, f'closest: {dt*1e3:.2f} ms, {R/dt/1e6:.1f} Mray/s', flush=True)
    g = jax.jit(lambda o, d, tm, ex: any_fn(o, d, tm, ex))
    tm = jnp.full((R,), 500.0); ex = jnp.zeros((R,), jnp.int32)
    t0=time.time(); r = g(o,d,tm,ex); jax.block_until_ready(r); print(name, 'any compile+run', round(time.time()-t0,2), flush=True)
    ts=[]
    for _ in range(5):
        t0=time.time(); r = g(o,d,tm,ex); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(name, f'any: {min(ts)*1e3:.2f} ms, {R/min(ts)/1e6:.1f} Mray/s', flush=True)

# full render bench through render_samples with pallas
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA as cam
xres = yres = 512
ys, xs = np.meshgrid(np.arange(yres,dtype=np.int32), np.arange(xres,dtype=np.int32), indexing='ij')
px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))
eye=jnp.asarray(cam["eye"],jnp.float32); center=jnp.asarray(cam["center"],jnp.float32); up=jnp.asarray(cam["up"],jnp.float32)
closest_fn, any_fn = make_intersectors(scene, "pallas")
spp, depth = 16, 3
fr = jax.jit(lambda s, ss: render_samples(s, eye, center, up, jnp.float32(cam["yview"]), xres, yres, px, py, ss, spp, jnp.uint32(0), depth, jnp.zeros(3,jnp.float32), closest_fn, any_fn))
t0=time.time(); fr(scene, jnp.int32(0)).block_until_ready(); print('render compile+run', round(time.time()-t0,1), flush=True)
ts=[]
for i in range(3):
    t0=time.time(); fr(scene, jnp.int32((i+1)*spp)).block_until_ready(); ts.append(time.time()-t0)
dt=min(ts)
q = xres*yres*spp*depth*2
print(f'render 512x512@{spp}spp d{depth}: {dt*1e3:.1f} ms -> {q/dt/1e6:.1f} Mray-queries/s', flush=True)
