"""Statistical parity against the reference's golden renders.

The reference's exact RNG streams are unknowable (its prng.cpp is missing
from the tree, SURVEY.md quirk 1), so per-pixel bitwise comparison is
impossible; instead we compare *block means* of a render of the calibrated
``cornell_box_original`` builtin against ``renders/cornell_box.exr``
(Monte-Carlo means converge to the same integral if the estimator matches).
Bulk-region block means agree to ~15% at test sample counts; the light /
ceiling band is excluded (sub-pixel geometry of the light sliver dominates
there) as are firefly outliers.

Marked slow: one depth-6 render at 200 spp.
"""

import numpy as np
import pytest

from chiaroscuro_tpu.render.image_io import read_exr
from chiaroscuro_tpu.render.renderer import render_image
from chiaroscuro_tpu.scene.builtin import (
    CORNELL_ORIGINAL_CAMERA,
    cornell_box_original,
)
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


@pytest.mark.slow
def test_cornell_block_means_match_reference_golden(reference_renders_dir):
    golden = np.nan_to_num(
        read_exr(f"{reference_renders_dir}/cornell_box.exr"), nan=0.0
    )
    assert golden.shape == (600, 600, 3)
    gold = golden.reshape(60, 10, 60, 10, 3).mean(axis=(1, 3))

    scene = build_scene_arrays(cornell_box_original())
    cam = CORNELL_ORIGINAL_CAMERA
    cfg = RenderConfig(
        xres=60, yres=60, k=6, samples=200, seed=0, intersector="brute",
        vp=cam["eye"], la=cam["center"], up=cam["up"], yview=cam["yview"],
        spp_chunk=50,
    )
    ours = np.asarray(render_image(scene, cfg))

    # Whole-image channel means within 10%.
    np.testing.assert_allclose(
        ours.mean(axis=(0, 1)), gold.mean(axis=(0, 1)), rtol=0.10
    )

    # Bulk block means (exclude the top light/ceiling band, rows < 20).
    ob = ours[20:].reshape(8, 5, 12, 5, 3).mean(axis=(1, 3))
    gb = gold[20:].reshape(8, 5, 12, 5, 3).mean(axis=(1, 3))
    rel = np.abs(ob - gb) / (gb + 1e-3)
    assert np.median(rel) < 0.15
    # 90% of bulk blocks within 50% (MC noise at 200 spp + fireflies).
    assert np.percentile(rel, 90) < 0.5


@pytest.mark.slow
def test_cornell_structure_matches_golden(reference_renders_dir):
    """Structural checks independent of absolute calibration: the light
    sliver's position/extent and the red/green wall lateralization."""
    golden = np.nan_to_num(
        read_exr(f"{reference_renders_dir}/cornell_box.exr"), nan=0.0
    )
    scene = build_scene_arrays(cornell_box_original())
    cam = CORNELL_ORIGINAL_CAMERA
    cfg = RenderConfig(
        xres=120, yres=120, k=2, samples=64, seed=1, intersector="brute",
        vp=cam["eye"], la=cam["center"], up=cam["up"], yview=cam["yview"],
    )
    ours = np.asarray(render_image(scene, cfg))

    def light_rows(img):
        thr = np.percentile(img.max(axis=-1), 99.7)
        ys, xs = np.where(img.max(axis=-1) > thr)
        return ys.mean() / img.shape[0], (xs.max() - xs.min()) / img.shape[1]

    gy, gw = light_rows(golden)
    oy, ow = light_rows(ours)
    assert abs(gy - oy) < 0.03   # light sliver at the same relative height
    assert abs(gw - ow) < 0.05   # same relative width

    # Left wall redder than green; right wall greener than red (both images).
    for img in (golden, ours):
        h, w = img.shape[:2]
        left = img[h // 3 : 2 * h // 3, : w // 12].mean(axis=(0, 1))
        right = img[h // 3 : 2 * h // 3, -w // 12 :].mean(axis=(0, 1))
        assert left[0] > 3 * left[1]
        assert right[1] > 2 * right[0]
