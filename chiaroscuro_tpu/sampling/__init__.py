from chiaroscuro_tpu.sampling.prng import (
    aa_jitter,
    bounce_uniforms,
    pixel_sample_key,
    N_BOUNCE_DIMS,
    DIM_LIGHT_SEL,
    DIM_LIGHT_U,
    DIM_LIGHT_V,
    DIM_RR,
    DIM_BSDF_U,
    DIM_BSDF_V,
)
from chiaroscuro_tpu.sampling.samplers import (
    concentric_sample_disk,
    cosine_sample_hemisphere,
    perpendicular,
    tangent_frame,
    sample_wi_diffuse,
)

__all__ = [
    "aa_jitter",
    "bounce_uniforms",
    "pixel_sample_key",
    "N_BOUNCE_DIMS",
    "DIM_LIGHT_SEL",
    "DIM_LIGHT_U",
    "DIM_LIGHT_V",
    "DIM_RR",
    "DIM_BSDF_U",
    "DIM_BSDF_V",
    "concentric_sample_disk",
    "cosine_sample_hemisphere",
    "perpendicular",
    "tangent_frame",
    "sample_wi_diffuse",
]
