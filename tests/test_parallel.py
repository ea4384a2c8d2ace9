"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
``--xla_force_host_platform_device_count=8``).

Asserts the BASELINE.json contract: N-device tile-sharded renders are
**bitwise identical** to single-device renders (counter-based PRNG), and
scene-parameter gradients psum correctly across the mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.parallel.sharding import (
    make_tile_mesh,
    render_frame_sharded,
)
from chiaroscuro_tpu.render.renderer import render_image, render_samples
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


@pytest.fixture(scope="module")
def setup(cpu_devices):
    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    cfg = RenderConfig(
        xres=16, yres=8, k=2, samples=2, seed=0, intersector="brute",
        vp=cam["eye"], la=cam["center"], up=cam["up"], yview=cam["yview"],
    )
    return scene, cfg, cam


def test_sharded_render_bitwise_matches_single(setup, cpu_devices):
    scene, cfg, cam = setup
    # Single-device reference on the same (CPU) platform as the mesh --
    # bitwise equality is a per-platform contract.
    with jax.default_device(cpu_devices[0]):
        single = np.asarray(render_image(scene, cfg))

    closest_fn, any_fn = make_intersectors(scene, "brute")
    for n_dev in (2, 8):
        mesh = make_tile_mesh(cpu_devices[:n_dev])
        sharded = render_frame_sharded(
            scene, mesh,
            jnp.asarray(cam["eye"], jnp.float32),
            jnp.asarray(cam["center"], jnp.float32),
            jnp.asarray(cam["up"], jnp.float32),
            jnp.float32(cam["yview"]),
            cfg.xres, cfg.yres, cfg.samples, jnp.uint32(0), cfg.k,
            jnp.zeros(3, jnp.float32), closest_fn, any_fn,
        )
        np.testing.assert_array_equal(single, np.asarray(sharded))


def test_sharded_gradients_psum(setup, cpu_devices):
    """Sharded loss+grad == single-device loss+grad on the same pixels."""
    scene, cfg, cam = setup
    closest_fn, any_fn = make_intersectors(scene, "brute")

    eye = jnp.asarray(cam["eye"], jnp.float32)
    center = jnp.asarray(cam["center"], jnp.float32)
    up = jnp.asarray(cam["up"], jnp.float32)

    ys, xs = np.meshgrid(
        np.arange(cfg.yres, dtype=np.int32),
        np.arange(cfg.xres, dtype=np.int32),
        indexing="ij",
    )
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))

    def tile_loss(params, px, py, denom):
        s = dataclasses.replace(scene, **params)
        img = render_samples(
            s, eye, center, up, jnp.float32(cam["yview"]),
            cfg.xres, cfg.yres, px, py, jnp.int32(0), cfg.samples,
            jnp.uint32(0), cfg.k, jnp.zeros(3, jnp.float32),
            closest_fn, any_fn,
        )
        return jnp.sum(img) / denom

    params = {"kd": scene.kd, "ke": scene.ke}
    n_pix = px.shape[0]

    with jax.default_device(cpu_devices[0]):
        ref_loss, ref_grads = jax.jit(jax.value_and_grad(tile_loss))(
            params, px, py, n_pix
        )

    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(cpu_devices[:8]), ("tile",))

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None), P("tile"), P("tile")),
        out_specs=(P(), P(None)),
    )
    def sharded(params, px, py):
        loss, grads = jax.value_and_grad(tile_loss)(params, px, py, n_pix)
        return jax.lax.psum(loss, "tile"), jax.lax.psum(grads, "tile")

    sh_loss, sh_grads = sharded(params, px, py)
    np.testing.assert_allclose(float(ref_loss), float(sh_loss), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(ref_grads[k]), np.asarray(sh_grads[k]), rtol=1e-5,
            atol=1e-8,
        )


def test_seed_changes_image(setup):
    scene, cfg, _ = setup
    a = np.asarray(render_image(scene, cfg))
    b = np.asarray(render_image(scene, dataclasses.replace(cfg, seed=123)))
    assert not np.array_equal(a, b)
