"""Preview subsystem tests: fly camera math, input state machine, raster mode.

The reference's preview is manual-only (no tests exist upstream); these pin
the semantics of ``src/camera.cpp:32-88`` and
``src/openglPreview.cpp:102-197`` that ``preview/`` reproduces headlessly.
"""

import numpy as np
import pytest

from chiaroscuro_tpu.preview import flycam
from chiaroscuro_tpu.preview.flycam import FlyCamera, yview_to_zoom, zoom_to_yview
from chiaroscuro_tpu.preview.state import PreviewState


# ---------------------------------------------------------------------------
# FlyCamera
# ---------------------------------------------------------------------------


def test_seeded_camera_faces_look_at():
    # Divergence from camera.cpp:11-19 (radians/degrees bug there): our
    # camera must actually face the configured LA point.
    eye = np.array([1.0, 2.0, 3.0])
    la = np.array([-2.0, 0.5, -4.0])
    cam = FlyCamera(eye, la, (0, 1, 0))
    want = (la - eye) / np.linalg.norm(la - eye)
    np.testing.assert_allclose(cam.front, want, atol=1e-12)


def test_zoom_yview_roundtrip():
    # openglPreview.cpp:42 seeds zoom from yview; :248 converts back.
    for yv in (0.5, 1.0, 1.8):
        assert zoom_to_yview(yview_to_zoom(yv)) == pytest.approx(yv, rel=1e-12)
    cam = FlyCamera((0, 0, 2), (0, 0, 0), (0, 1, 0), yview=1.25)
    assert cam.yview == pytest.approx(1.25, rel=1e-12)
    assert cam.zoom == pytest.approx(np.degrees(2 * np.arctan(0.625)))


def test_render_args_match_reference_basis():
    """FlyCamera seeded from (VP, LA, UP) must generate the same primary rays
    as the batch path called with (VP, LA, UP) directly — pressing R before
    moving re-renders the scene's own view (openglPreview.cpp:246-250)."""
    import jax.numpy as jnp

    from chiaroscuro_tpu.geometry.camera import camera_basis

    vp, la, up, yv = (0.2, 1.0, 3.9), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0), 1.0
    cam = FlyCamera(vp, la, up, yview=yv)
    eye, center, cup, yview = cam.render_args()
    ref = camera_basis(jnp.asarray(vp), jnp.asarray(la), jnp.asarray(up), yv, 64, 64)
    got = camera_basis(eye, center, cup, yview, 64, 64)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mouse_look_sensitivity_and_pitch_clamp():
    cam = FlyCamera((0, 0, 2), (0, 0, 0), (0, 1, 0))
    yaw0, pitch0 = cam.yaw, cam.pitch
    cam.process_mouse_movement(100.0, 50.0)
    # SENSITIVITY = 0.1 (camera.hpp:19): offsets scale by 0.1.
    assert cam.yaw == pytest.approx(yaw0 + 10.0)
    assert cam.pitch == pytest.approx(pitch0 + 5.0)
    cam.process_mouse_movement(0.0, 1e6)   # camera.cpp:56-60 clamp
    assert cam.pitch == 89.0
    cam.process_mouse_movement(0.0, -1e7)
    assert cam.pitch == -89.0
    assert np.isfinite(cam.front).all()


def test_scroll_zoom_clamps_1_to_90():
    cam = FlyCamera((0, 0, 2), (0, 0, 0), (0, 1, 0), yview=1.0)
    cam.process_mouse_scroll(1000.0)       # camera.cpp:64-70
    assert cam.zoom == 1.0
    cam.process_mouse_scroll(-1000.0)
    assert cam.zoom == 90.0
    assert cam.yview == pytest.approx(2.0 * np.tan(np.radians(45.0)))


def test_keyboard_motion_signs():
    cam = FlyCamera((0, 0, 0), (0, 0, -1), (0, 1, 0))
    cam.process_keyboard(flycam.FORWARD, 1.0)
    np.testing.assert_allclose(
        cam.position, cam.front * flycam.SPEED, atol=1e-12
    )
    # Reference quirk (camera.cpp:41-44): UPWARD moves against Up.
    cam2 = FlyCamera((0, 0, 0), (0, 0, -1), (0, 1, 0))
    cam2.process_keyboard(flycam.UPWARD, 1.0)
    assert float(cam2.position @ cam2.up) < 0.0


# ---------------------------------------------------------------------------
# PreviewState (stub renderer — no device work)
# ---------------------------------------------------------------------------


class _StubCfg:
    vp, la, up, yview = (0.0, 0.0, 2.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 1.0
    exposure = 5.0
    xres = yres = 8


class _StubRenderer:
    def __init__(self):
        self.cfg = _StubCfg()
        self.ray_trace_calls = []
        self.normalize_calls = []

    def ray_trace(self, eye, center, up, yview):
        self.ray_trace_calls.append((tuple(eye), tuple(center), tuple(up), yview))
        return np.zeros((8, 8, 3), np.float32)

    def normalize_image(self, exposure):
        self.normalize_calls.append(exposure)
        return np.full((8, 8, 3), 128, np.uint8)


def test_press_r_renders_and_shows():
    r = _StubRenderer()
    st = PreviewState(r)
    assert not st.show_render
    st.press_r()
    assert st.show_render and len(r.ray_trace_calls) == 1
    # R again without moving: same camera args -> progressive accumulation
    # happens inside Renderer (rayTracer.cpp:18-33).
    st.press_r()
    assert r.ray_trace_calls[0] == r.ray_trace_calls[1]
    assert (st.display_image() == 128).all()


def test_exposure_retonemaps_without_tracing():
    r = _StubRenderer()
    st = PreviewState(r)
    st.press_r()
    n_trace = len(r.ray_trace_calls)
    st.adjust_exposure(+0.2)
    st.adjust_exposure(-0.2)
    assert len(r.ray_trace_calls) == n_trace       # openglPreview.cpp:157-173
    assert r.normalize_calls[-2:] == [pytest.approx(5.2), pytest.approx(5.0)]


def test_inputs_inert_while_render_shown():
    r = _StubRenderer()
    st = PreviewState(r)
    st.press_r()
    pos0, yaw0, zoom0 = st.camera.position.copy(), st.camera.yaw, st.camera.zoom
    assert not st.mouse_move(50.0, 0.0)            # openglPreview.cpp:108-110
    assert not st.scroll(1.0)                      # openglPreview.cpp:131-133
    assert not st.move_key("w", 0.1)               # openglPreview.cpp:179
    assert st.camera.yaw == yaw0 and st.camera.zoom == zoom0
    np.testing.assert_array_equal(st.camera.position, pos0)
    st.press_tab()                                 # back to walk-through
    assert st.mouse_move(50.0, 0.0) and st.scroll(1.0) and st.move_key("w", 0.1)


def test_tab_toggles_and_moving_resets_after_rerender():
    r = _StubRenderer()
    st = PreviewState(r)
    st.press_r()
    st.press_tab()
    assert not st.show_render
    st.move_key("w", 0.5)
    st.press_r()
    # Camera moved: new ray_trace args differ -> Renderer resets accumulation.
    assert r.ray_trace_calls[0] != r.ray_trace_calls[-1]


def test_shift_is_fast():
    st = PreviewState(_StubRenderer())
    start = st.camera.position.copy()
    st.move_key("w", 1.0, fast=False)
    slow = np.linalg.norm(st.camera.position - start)
    st2 = PreviewState(_StubRenderer())
    st2.move_key("w", 1.0, fast=True)              # openglPreview.cpp:192-195
    fast = np.linalg.norm(st2.camera.position - start)
    assert fast == pytest.approx(slow * flycam.FAST_SPEED / flycam.SPEED)


def test_raster_fallback_black_and_fn_wiring():
    r = _StubRenderer()
    st = PreviewState(r)
    assert (st.display_image() == 0).all()         # no raster_fn -> black
    frames = []

    def raster(cam):
        frames.append(cam.position.copy())
        return np.full((8, 8, 3), 0.5, np.float32)

    st2 = PreviewState(r, raster_fn=raster)
    img = st2.display_image()
    assert img.dtype == np.uint8 and img.max() == 128  # 0.5 * 255 + .5
    st2.display_image()
    assert len(frames) == 1                        # cached until camera moves
    st2.move_key("w", 0.1)
    st2.display_image()
    assert len(frames) == 2


# ---------------------------------------------------------------------------
# Raster walk-through on a real scene
# ---------------------------------------------------------------------------


def test_raster_frame_cornell(cornell_scene):
    from chiaroscuro_tpu.accel import make_intersectors
    from chiaroscuro_tpu.preview.raster import raster_frame
    from chiaroscuro_tpu.scene.config import RenderConfig

    cfg = RenderConfig(xres=32, yres=24, vp=(0.0, 1.0, 3.9), la=(0.0, 1.0, 0.0))
    cam = FlyCamera(cfg.vp, cfg.la, cfg.up, cfg.yview)
    closest_fn, _ = make_intersectors(cornell_scene, "brute")
    img = raster_frame(cornell_scene, cfg, cam, closest_fn)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    # The box fills the view from inside: the vast majority of pixels shade.
    assert (img.sum(axis=-1) > 0).mean() > 0.9
    # Phong shading varies across walls (not a constant fill).
    assert img.std() > 0.01
