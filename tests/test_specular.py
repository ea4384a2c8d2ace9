"""Phong specular extension tests (disabled by default = reference parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiaroscuro_tpu.render.renderer import render_image
from chiaroscuro_tpu.sampling.samplers import phong_pdf, reflect, sample_phong_lobe
from chiaroscuro_tpu.scene.builtin import cornell_box
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.obj_loader import Mesh
from chiaroscuro_tpu.scene.scene_arrays import (
    BRDF_PHONG,
    build_scene_arrays,
)


def _mesh(name, tris, kd, ke=(0, 0, 0), ks=(0, 0, 0), ns=10.0):
    tris = np.asarray(tris, np.float32)
    positions = tris.reshape(-1, 3)
    normals, indices = [], []
    for i, t in enumerate(tris):
        n = np.cross(t[1] - t[0], t[2] - t[0])
        n = n / np.linalg.norm(n)
        normals += [n, n, n]
        indices.append((3 * i, 3 * i + 1, 3 * i + 2))
    return Mesh(
        name=name, positions=positions,
        normals=np.asarray(normals, np.float32),
        uvs=np.zeros((len(positions), 2), np.float32),
        indices=np.asarray(indices, np.int32),
        diffuse=np.asarray(kd, np.float32),
        emissive=np.asarray(ke, np.float32),
        ambient=np.zeros(3, np.float32),
        specular=np.asarray(ks, np.float32),
        shininess=ns,
    )


def test_phong_lobe_pdf_normalized(rng):
    """Monte-Carlo check: E[1/pdf] over lobe samples = hemisphere measure."""
    ns = jnp.full((1 << 14,), 20.0)
    wr = jnp.asarray([[0.0, 0.0, 1.0]]).repeat(1 << 14, 0)
    u = jnp.asarray(rng.uniform(size=1 << 14), jnp.float32)
    v = jnp.asarray(rng.uniform(size=1 << 14), jnp.float32)
    wi, cos_a = sample_phong_lobe(wr, ns, u, v)
    pdf = phong_pdf(wr, wi, ns)
    np.testing.assert_allclose(
        np.asarray(pdf),
        (20.0 + 1) / (2 * np.pi) * np.asarray(cos_a) ** 20.0,
        rtol=1e-4,
    )
    # cos_a distribution: E[cos^k] = (ns+1)/(ns+1+k)
    assert np.isclose(np.asarray(cos_a).mean(), 21.0 / 22.0, atol=0.01)


def test_reflect():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    wo = jnp.asarray([[0.6, 0.8, 0.0]])
    wr = reflect(wo, n)
    np.testing.assert_allclose(np.asarray(wr), [[-0.6, 0.8, 0.0]], atol=1e-6)


def test_specular_disabled_keeps_parity():
    """enable_specular=False must produce byte-identical renders to before the
    extension existed: brdf_type never becomes PHONG, integrator takes the
    reference-exact branch."""
    meshes = cornell_box()
    # Give every mesh a nonzero Ks: without the flag this must change nothing.
    for m in meshes:
        m.specular = np.asarray([0.5, 0.5, 0.5], np.float32)
    plain = build_scene_arrays(meshes)
    assert not plain.has_specular
    assert not (np.asarray(plain.brdf_type) == BRDF_PHONG).any()


def test_specular_adds_highlight():
    """A glossy floor under a light shows a stronger peak toward the mirror
    direction than a pure-diffuse floor."""
    floor_kwargs = dict(
        tris=[
            [(-5, 0, -5), (5, 0, 5), (5, 0, -5)],
            [(-5, 0, -5), (-5, 0, 5), (5, 0, 5)],
        ],
        kd=(0.3, 0.3, 0.3),
    )
    light = _mesh(
        "l:light",
        [[(-0.4, 4.0, -0.4), (0.4, 4.0, -0.4), (0.0, 4.0, 0.4)]],
        (1, 1, 1),
        ke=(30.0, 30.0, 30.0),
    )
    cam = dict(vp=(0.0, 2.0, 6.0), la=(0.0, 0.0, 0.0), up=(0, 1, 0), yview=0.9)
    cfg = RenderConfig(
        xres=32, yres=32, k=1, samples=64, seed=0, intersector="brute", **cam
    )

    diffuse_scene = build_scene_arrays(
        [_mesh("f:d", **floor_kwargs), light], enable_specular=True
    )
    glossy_scene = build_scene_arrays(
        [_mesh("f:s", ks=(0.6, 0.6, 0.6), ns=50.0, **floor_kwargs), light],
        enable_specular=True,
    )
    assert glossy_scene.has_specular and not diffuse_scene.has_specular

    img_d = np.asarray(render_image(diffuse_scene, cfg))
    img_s = np.asarray(render_image(glossy_scene, cfg))
    assert np.isfinite(img_s).all()
    # The glossy floor has a bright highlight: its max pixel well above the
    # diffuse image's max; away from the highlight they are comparable.
    assert img_s.max() > 2.0 * img_d.max()


def test_specular_gradients_finite_and_fd():
    """d(loss)/d(Ks) is finite and matches finite differences."""
    floor = _mesh(
        "f:s",
        [
            [(-5, 0, -5), (5, 0, 5), (5, 0, -5)],
            [(-5, 0, -5), (-5, 0, 5), (5, 0, 5)],
        ],
        kd=(0.3, 0.3, 0.3),
        ks=(0.5, 0.5, 0.5),
        ns=30.0,
    )
    light = _mesh(
        "l:light",
        [[(-0.4, 4.0, -0.4), (0.4, 4.0, -0.4), (0.0, 4.0, 0.4)]],
        (1, 1, 1),
        ke=(30.0, 30.0, 30.0),
    )
    scene = build_scene_arrays([floor, light], enable_specular=True)
    cfg = RenderConfig(
        xres=12, yres=12, k=2, samples=16, seed=0, intersector="brute",
        vp=(0.0, 2.0, 6.0), la=(0.0, 0.0, 0.0), up=(0, 1, 0), yview=0.9,
    )

    def loss(params):
        s = dataclasses.replace(scene, **params)
        return jnp.mean(render_image(s, cfg))

    g = jax.grad(loss)({"ks": scene.ks})["ks"]
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0

    eps = 1e-3
    idx = (0, 0)
    base = {"ks": scene.ks}
    def perturb(d):
        arr = np.asarray(scene.ks).copy()
        arr[idx] += d
        return float(loss({"ks": jnp.asarray(arr)}))
    fd = (perturb(eps) - perturb(-eps)) / (2 * eps)
    auto = float(np.asarray(jax.grad(loss)(base)["ks"])[idx])
    assert np.isclose(auto, fd, rtol=0.05), (auto, fd)
