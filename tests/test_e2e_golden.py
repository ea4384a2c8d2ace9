"""End-to-end golden tests against the reference's shipped render artifacts.

The reference ships no tests; its de-facto fixtures are the renders in
``renders/`` (SURVEY.md §4, C16).  Two of them pair with in-tree assets AND
legacy ``.rtc`` scene files, exercising the whole stack in one shot each:

- ``view_test.rtc`` + ``data/view_test.obj`` -> ``renders/view_test.png``
  (legacy config parse, OBJ groups/materials, point light, tone map, PNG);
- ``nanosuit.rtc`` + ``data/nanosuit.obj`` -> ``renders/nanosuit.png``
  (19k tris, 6 textured materials, texture atlas, BVH, point lights).

The golden PNGs were produced by an *older build* of the reference (the
current parser cannot even read these legacy files, and their `L` point
lights are dead code in the current integrator — SURVEY.md quirk 3), so the
comparison is structural: silhouettes, color-region geometry, and
order-of-magnitude brightness — not pixelwise radiance.
"""

import os

import numpy as np
import pytest

from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene
from chiaroscuro_tpu.render.renderer import render_image
from chiaroscuro_tpu.render.tonemap import normalize_image


def _load_png(path, resize=None):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if resize is not None:
        img = img.resize(resize, Image.BILINEAR)
    return np.asarray(img).astype(np.float32) / 255.0


def _render_legacy(rtc_name, reference_dir, overrides):
    rtc = os.path.join(reference_dir, rtc_name)
    cfg = RenderConfig.from_rtc(rtc, overrides)
    # Asset paths in the legacy files are relative to the reference root.
    cfg.obj_path = os.path.join(reference_dir, cfg.obj_path)
    scene = load_scene(cfg)
    img = np.asarray(render_image(scene, cfg))
    return cfg, scene, normalize_image(img, cfg.exposure).astype(np.float32) / 255.0


def test_view_test_e2e_matches_golden(reference_renders_dir, reference_data_dir):
    """Legacy parse -> OBJ (2 materials, 4 tris) -> point light -> tone map
    -> structural parity with ``renders/view_test.png`` (600x400).

    The golden shows a red quad lower-left and a blue quad upper-right on
    black; camera framing must match exactly (camera math is shared with the
    tested-exact ``geometry/camera.py``), so region masks are compared with
    a tight IoU.  Absolute brightness is NOT compared (unknown old-build
    light scale; our render saturates where the golden falls off).
    """
    ref_root = os.path.dirname(reference_data_dir)
    cfg, scene, ours = _render_legacy(
        "view_test.rtc", ref_root, ["samples", "8", "intersector", "brute"]
    )
    assert cfg.xres == 600 and cfg.yres == 400 and cfg.k == 1
    assert scene.n_point_lights == 1
    golden = _load_png(
        os.path.join(reference_renders_dir, "view_test.png"),
        resize=(cfg.xres, cfg.yres),
    )
    assert golden.shape == ours.shape

    def masks(img):
        lum = img.max(axis=2)
        lit = lum > 0.05
        red = lit & (img[..., 0] > 2.0 * np.maximum(img[..., 2], 0.02))
        blue = lit & (img[..., 2] > 2.0 * np.maximum(img[..., 0], 0.02))
        return lit, red, blue

    g_lit, g_red, g_blue = masks(golden)
    o_lit, o_red, o_blue = masks(ours)

    def iou(a, b):
        return (a & b).sum() / max((a | b).sum(), 1)

    assert iou(g_lit, o_lit) > 0.95
    assert iou(g_red, o_red) > 0.9
    assert iou(g_blue, o_blue) > 0.9
    # Background stays black in both.
    assert ours[~g_lit].max() < 0.05


@pytest.mark.slow
def test_nanosuit_e2e_structural(reference_renders_dir, reference_data_dir):
    """Full large-scene path: legacy ``nanosuit.rtc`` -> 19,058-triangle OBJ
    with 6 textured materials -> texture atlas -> accelerated intersector ->
    point-light shading -> tone map; compared structurally against
    ``renders/nanosuit.png`` (1060x1920, unknown old build).
    """
    ref_root = os.path.dirname(reference_data_dir)
    # 1/8 resolution of the golden's 1060x1920 keeps this CPU-feasible.
    cfg, scene, ours = _render_legacy(
        "nanosuit.rtc",
        ref_root,
        ["xres", "132", "yres", "240", "samples", "4", "k", "2",
         "intersector", "bvh"],
    )
    assert scene.n_tris == 19058
    assert scene.n_point_lights == 2
    assert int(np.asarray(scene.tex_id).max()) >= 0, "textures must be on"
    golden = _load_png(
        os.path.join(reference_renders_dir, "nanosuit.png"),
        resize=(cfg.xres, cfg.yres),
    )

    g_sil = golden.max(axis=2) > 0.02
    o_sil = ours.max(axis=2) > 0.02
    iou = (g_sil & o_sil).sum() / (g_sil | o_sil).sum()
    assert iou > 0.55, f"silhouette IoU {iou:.3f}"

    # Suit bounding boxes align within ~6% of the frame.
    def bbox(m):
        ys, xs = np.where(m)
        return np.array(
            [ys.min() / m.shape[0], ys.max() / m.shape[0],
             xs.min() / m.shape[1], xs.max() / m.shape[1]]
        )

    assert np.abs(bbox(g_sil) - bbox(o_sil)).max() < 0.06

    # Order-of-magnitude brightness agreement inside the silhouette (the
    # old build's point-light scale is unknowable; raw-intensity semantics
    # land within ~2x on this scene).
    g_mean = golden.mean(axis=2)[g_sil].mean()
    o_mean = ours.mean(axis=2)[o_sil].mean()
    assert 1 / 4 < o_mean / g_mean < 4, (o_mean, g_mean)

    # Background is black outside both silhouettes.
    assert ours[~(g_sil | o_sil)].max() < 0.02


def test_legacy_rtc_reference_files_parse(reference_data_dir):
    """The reference's own legacy scene files parse, incl. `L` lights
    (``nanosuit.rtc:2-11``, ``view_test.rtc:2-10``)."""
    ref_root = os.path.dirname(reference_data_dir)
    nano = RenderConfig.from_rtc(os.path.join(ref_root, "nanosuit.rtc"))
    assert nano.obj_path == "data/nanosuit.obj"
    assert (nano.xres, nano.yres, nano.k) == (1060, 1920, 1)
    assert nano.vp == (10.0, 16.0, 10.0)
    assert nano.la == (0.0, 8.5, 0.0)
    assert nano.yview == 1.0
    assert len(nano.light_points) == 2
    assert nano.light_points[0].position == (1.5, 12.0, 6.0)
    assert nano.light_points[0].intensity == 32.0
    assert nano.light_points[1].position == (0.0, 30.0, 0.0)
    assert nano.light_points[1].intensity == 320.0

    vt = RenderConfig.from_rtc(os.path.join(ref_root, "view_test.rtc"))
    assert vt.obj_path == "data/view_test.obj"
    assert (vt.xres, vt.yres) == (600, 400)
    assert len(vt.light_points) == 1
    assert vt.light_points[0].position == (0.5, 0.5, 0.5)

    # CLI overrides still apply on top of the legacy parse.
    over = RenderConfig.from_rtc(
        os.path.join(ref_root, "view_test.rtc"), ["xres", "64"]
    )
    assert over.xres == 64 and over.yres == 400


def test_point_lights_off_restores_reference_behavior(reference_data_dir):
    """`point-lights off` reproduces the current reference's actual behavior
    (lightPoints dead in the integrator): an emission-free scene renders to
    the background color."""
    ref_root = os.path.dirname(reference_data_dir)
    rtc = os.path.join(ref_root, "view_test.rtc")
    cfg = RenderConfig.from_rtc(
        rtc,
        ["xres", "32", "yres", "32", "samples", "2", "point-lights", "off",
         "intersector", "brute"],
    )
    cfg.obj_path = os.path.join(ref_root, cfg.obj_path)
    scene = load_scene(cfg)
    assert scene.n_point_lights == 0
    img = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
