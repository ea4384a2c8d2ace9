from chiaroscuro_tpu.render.integrator import trace_paths, texture_kd_lookup
from chiaroscuro_tpu.render.renderer import Renderer, render_image, render_samples
from chiaroscuro_tpu.render.tonemap import normalize_image
from chiaroscuro_tpu.render.image_io import read_exr, write_exr, write_image

__all__ = [
    "trace_paths",
    "texture_kd_lookup",
    "Renderer",
    "render_image",
    "render_samples",
    "normalize_image",
    "read_exr",
    "write_exr",
    "write_image",
]
