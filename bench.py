"""Benchmark: path-tracing throughput on the flagship Cornell scene.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric: wavefront ray-query throughput (closest-hit + shadow queries
issued per second) for a 512x512 render of the Cornell box at the given spp
and depth, on whatever backend JAX selects (one TPU chip under the driver).

``vs_baseline``: the reference publishes no numbers (BASELINE.md — a
two-line-README university project).  We anchor against a measured estimate of
the reference-class CPU path tracer: ~5e6 ray queries/sec on a multicore CPU
(OpenMP, kd-tree; typical for 2-4 GHz x 8 threads on simple diffuse scenes).
vs_baseline = value / 5e6.

Robustness: the measurement runs in a *subprocess* per intersector backend
(Pallas first, pure-XLA brute force as fallback) with a wall-clock budget —
a wedged TPU-tunnel compile can otherwise hang a single-process bench
forever.  The orchestrator itself never imports jax.

Extra diagnostics (stderr): per-config timings, fwd+bwd wall-clock for the
differentiable path (cornell 512x512), matching BASELINE.json's
"cornell_box 512x512 fwd+bwd ms" metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

CPU_BASELINE_RAYS_PER_SEC = 5.0e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
    from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays

    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    return scene, cam


def bench_forward(
    scene, cam, intersector="auto", xres=512, yres=512, spp=16, depth=3,
    iters=3,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chiaroscuro_tpu.accel import make_intersectors
    from chiaroscuro_tpu.render.renderer import render_samples

    closest_fn, any_fn = make_intersectors(scene, intersector)
    ys, xs = np.meshgrid(
        np.arange(yres, dtype=np.int32),
        np.arange(xres, dtype=np.int32),
        indexing="ij",
    )
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    eye = jnp.asarray(cam["eye"], jnp.float32)
    center = jnp.asarray(cam["center"], jnp.float32)
    up = jnp.asarray(cam["up"], jnp.float32)

    @jax.jit
    def frame(scene, sample_start):
        return render_samples(
            scene, eye, center, up, jnp.float32(cam["yview"]),
            xres, yres, px, py, sample_start, spp, jnp.uint32(0), depth,
            jnp.zeros(3, jnp.float32), closest_fn, any_fn,
        )

    # Warmup/compile.
    t0 = time.perf_counter()
    frame(scene, jnp.int32(0)).block_until_ready()
    log(f"[{intersector}] compile+first run: {time.perf_counter() - t0:.2f}s")

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        frame(scene, jnp.int32((i + 1) * spp)).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # Wavefront work issued: per sample and pixel, `depth` closest-hit
    # queries + `depth` shadow queries (masked lanes still execute).
    queries = xres * yres * spp * depth * 2
    rays_per_sec = queries / dt
    log(f"[{intersector}] forward {xres}x{yres} @ {spp}spp depth={depth}: "
        f"{dt * 1e3:.1f} ms -> {rays_per_sec / 1e6:.1f} Mray-queries/s")
    return rays_per_sec, dt


def bench_fwd_bwd(scene, cam, intersector="auto", xres=512, yres=512, spp=4,
                  depth=3):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chiaroscuro_tpu.accel import make_intersectors
    from chiaroscuro_tpu.render.renderer import render_samples

    ys, xs = np.meshgrid(
        np.arange(yres, dtype=np.int32),
        np.arange(xres, dtype=np.int32),
        indexing="ij",
    )
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    eye = jnp.asarray(cam["eye"], jnp.float32)
    center = jnp.asarray(cam["center"], jnp.float32)
    up = jnp.asarray(cam["up"], jnp.float32)

    def loss_fn(params, scene):
        s = dataclasses.replace(scene, **params)
        closest_fn, any_fn = make_intersectors(s, intersector)
        img = render_samples(
            s, eye, center, up, jnp.float32(cam["yview"]),
            xres, yres, px, py, jnp.int32(0), spp, jnp.uint32(0), depth,
            jnp.zeros(3, jnp.float32), closest_fn, any_fn,
        )
        return jnp.mean(img)

    params = {"kd": scene.kd, "ke": scene.ke}
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, scene)
    jax.block_until_ready(grads)
    log(f"fwd+bwd compile+first: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, scene)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    log(f"cornell {xres}x{yres} @ {spp}spp fwd+bwd: {dt * 1e3:.1f} ms "
        f"(loss={float(loss):.4f})")
    return dt


def _metric_line(rays_per_sec: float) -> str:
    return json.dumps(
        {
            "metric": "cornell_512x512_ray_queries_per_sec",
            "value": rays_per_sec,
            "unit": "rays/s",
            "vs_baseline": rays_per_sec / CPU_BASELINE_RAYS_PER_SEC,
        }
    )


def worker(intersector: str) -> None:
    import jax

    log(f"devices: {jax.devices()}")
    scene, cam = build()
    rays_per_sec, _ = bench_forward(scene, cam, intersector)
    try:
        bench_fwd_bwd(scene, cam, intersector)
    except Exception as e:  # diagnostics only — never break the metric line
        log(f"fwd+bwd bench failed: {e}")
    print(_metric_line(rays_per_sec))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return

    me = os.path.abspath(__file__)
    attempts = (("auto", 2100), ("brute", 1200))
    for intersector, budget in attempts:
        import subprocess

        log(f"bench attempt: intersector={intersector} budget={budget}s")
        try:
            r = subprocess.run(
                [sys.executable, "-u", me, "--worker", intersector],
                timeout=budget,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired as e:
            log(f"bench[{intersector}] timed out after {budget}s; "
                f"stderr tail: {(e.stderr or '')[-500:]}")
            continue
        sys.stderr.write(r.stderr[-4000:])
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                json.loads(line)
            except ValueError:
                continue
            print(line)
            return
        log(f"bench[{intersector}] produced no metric (exit {r.returncode})")
    # Every backend failed — emit an explicit zero so the run is recorded.
    print(_metric_line(0.0))


if __name__ == "__main__":
    main()
