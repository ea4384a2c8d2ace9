import time, numpy as np, jax, jax.numpy as jnp
import chiaroscuro_tpu.ops.intersect_pallas as ip
from chiaroscuro_tpu.scene.builtin import cornell_box, CORNELL_CAMERA as cam
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.render.renderer import render_samples
scene = build_scene_arrays(cornell_box())
xres = yres = 512
ys, xs = np.meshgrid(np.arange(yres,dtype=np.int32), np.arange(xres,dtype=np.int32), indexing='ij')
px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))
eye=jnp.asarray(cam["eye"],jnp.float32); center=jnp.asarray(cam["center"],jnp.float32); up=jnp.asarray(cam["up"],jnp.float32)
closest_fn, any_fn = ip.make_pallas_intersectors(scene)
spp, depth = 4, 3
fr = jax.jit(lambda s, ss: render_samples(s, eye, center, up, jnp.float32(cam["yview"]), xres, yres, px, py, ss, spp, jnp.uint32(0), depth, jnp.zeros(3,jnp.float32), closest_fn, any_fn))
fr(scene, jnp.int32(0)).block_until_ready()
jax.profiler.start_trace('/tmp/jax_trace')
fr(scene, jnp.int32(99)).block_until_ready()
jax.profiler.stop_trace()
print('done', flush=True)
