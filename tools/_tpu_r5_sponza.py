"""Round-5 sponza forward sweep: cutoff two-phase overflow + Le + visit_t.

Usage: python tools/_tpu_r5_sponza.py [Le[,Le...]] [visit_t(0|1)] [tris]
Defaults: Le=512, visit_t=0, tris=480000.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel.clusters import build_clusters
from chiaroscuro_tpu.ops.cluster_pallas import make_cluster_intersectors
from chiaroscuro_tpu.render.renderer import render_samples
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.scene.synthetic import ATRIUM_CAMERA, atrium


def _sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    les = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                            else ["512"])]
    visit_t = len(sys.argv) > 2 and sys.argv[2] == "1"
    tris = int(sys.argv[3]) if len(sys.argv) > 3 else 480_000
    xres, yres, spp, depth = 1280, 720, 1, 3

    print(f"devices: {jax.devices()}", flush=True)
    scene = build_scene_arrays(atrium(tris))
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    print(f"tris={scene.n_tris} K={ca.K} KS={ca.KS}", flush=True)
    cam = ATRIUM_CAMERA
    ys, xs = np.meshgrid(np.arange(yres, dtype=np.int32),
                         np.arange(xres, dtype=np.int32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    eye = np.asarray(cam["eye"], np.float32)
    center = np.asarray(cam["center"], np.float32)
    up = np.asarray(cam["up"], np.float32)

    for Le in les:
        cf, af = make_cluster_intersectors(
            scene, clusters=ca, interpret=False, Lmax=Le, visit_t=visit_t,
        )
        bufs = cf.derive_buffers(scene)

        @jax.jit
        def frame(scene, bufs, s):
            c2, a2 = cf.bind_buffers(bufs)
            return render_samples(
                scene, eye, center, up, float(cam["yview"]),
                xres, yres, px, py, s, spp, np.uint32(0), depth,
                np.zeros(3, np.float32), c2, a2, with_stats=True,
            )

        t0 = time.perf_counter()
        _, st = frame(scene, bufs, jnp.int32(0))
        _sync(st)
        c = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            _, st = frame(scene, bufs, jnp.int32((i + 1) * spp))
            _sync(st)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        useful = float(st.sum())
        print(f"Le={Le:<4d} visit_t={int(visit_t)} compile {c:6.1f}s  "
              f"frame {dt * 1e3:8.1f} ms  ({useful / dt / 1e6:.2f} M useful "
              f"rays/s)  times={['%.0f' % (t * 1e3) for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
