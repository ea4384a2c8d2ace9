import time, numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
from chiaroscuro_tpu.scene.builtin import cornell_box, CORNELL_CAMERA
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.accel.dispatch import make_intersectors
scene = build_scene_arrays(cornell_box())
rng = np.random.default_rng(0)
R = 262144
lo, hi = np.asarray(scene.world_min), np.asarray(scene.world_max)
o = jnp.asarray(rng.uniform(lo, hi, (R,3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(R,3)), jnp.float32)

for name in ("brute", "pallas"):
    closest_fn, any_fn = make_intersectors(scene, name)
    f = jax.jit(lambda o, d: closest_fn(o, d))
    t0=time.time(); r = f(o,d); jax.block_until_ready(r); print(name, 'compile+run', round(time.time()-t0,2), flush=True)
    ts=[]
    for _ in range(5):
        t0=time.time(); r = f(o,d); jax.block_until_ready(r); ts.append(time.time()-t0)
    dt=min(ts)
    print(name, f'closest: {dt*1e3:.2f} ms, {R*scene.n_tris/dt/1e9:.1f} G MT-tests/s, {R/dt/1e6:.1f} Mray/s', flush=True)
