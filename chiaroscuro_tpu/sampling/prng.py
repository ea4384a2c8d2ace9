"""Counter-based PRNG streams, keyed on global (pixel, sample, bounce).

Replaces the reference's per-OpenMP-thread mutable RNG engines
(``prng.hpp`` / ``PRNG::rng[omp_get_thread_num()]``, SURVEY.md C12) with
stateless ``jax.random`` threefry keys derived purely from *global* counters:

    key(pixel, sample)          = fold_in(fold_in(PRNGKey(seed), pixel), sample)
    jitter stream               = fold_in(key, JITTER_TAG)
    bounce-k stream             = fold_in(key, k)

Because every random number is a pure function of (seed, global pixel index,
sample index, bounce index) — never of the device/shard that computes it —
renders are **bitwise identical for any sharding of the pixel grid** and for
any chunking of samples.  This is the TPU-native reproducibility contract from
BASELINE.json ("bitwise reproducible per shard").

Per-bounce consumption layout (fixed, so streams never shift):

    dim 0: light selection u      (scene.cpp:79-82 uniform light pick)
    dim 1: light bary u0          (rayTracer.cpp:96)
    dim 2: light bary u1          (rayTracer.cpp:97, scaled by (1-u0))
    dim 3: russian roulette       (rayTracer.cpp:126)
    dim 4: bsdf concentric-disk x (brdf.cpp:20)
    dim 5: bsdf concentric-disk y (brdf.cpp:21)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DIM_LIGHT_SEL = 0
DIM_LIGHT_U = 1
DIM_LIGHT_V = 2
DIM_RR = 3
DIM_BSDF_U = 4
DIM_BSDF_V = 5
DIM_LOBE = 6          # diffuse-vs-specular lobe pick (Phong extension)
N_BOUNCE_DIMS = 7

_JITTER_TAG = 0x51A77E12  # distinct from any bounce index


def pixel_sample_key(seed, pixel_idx: jax.Array, sample_idx) -> jax.Array:
    """Key for one (pixel, sample) pair. ``pixel_idx`` is the *global* linear
    pixel index ``y * xres + x`` — shard-invariant by construction."""
    key = jax.random.PRNGKey(seed)
    key = jax.random.fold_in(key, pixel_idx)
    return jax.random.fold_in(key, sample_idx)


def aa_jitter(key: jax.Array) -> jax.Array:
    """(2,) stratified-AA jitter in [0,1) (reference ``rayTracer.cpp:61``)."""
    return jax.random.uniform(jax.random.fold_in(key, _JITTER_TAG), (2,))


def bounce_uniforms(key: jax.Array, bounce: jax.Array) -> jax.Array:
    """(N_BOUNCE_DIMS,) uniforms in [0,1) for one path vertex."""
    return jax.random.uniform(jax.random.fold_in(key, bounce), (N_BOUNCE_DIMS,))


def bounce_uniforms_batch(keys: jax.Array, bounce: jax.Array) -> jax.Array:
    """(R, N_BOUNCE_DIMS) uniforms for a wavefront of R rays at one bounce."""
    return jax.vmap(bounce_uniforms, in_axes=(0, None))(keys, bounce)


def pixel_sample_keys(seed, pixel_idx: jax.Array, sample_idx) -> jax.Array:
    """Vectorized :func:`pixel_sample_key` over a batch of pixel indices."""
    return jax.vmap(pixel_sample_key, in_axes=(None, 0, None))(
        seed, pixel_idx, sample_idx
    )


def aa_jitter_batch(keys: jax.Array) -> jax.Array:
    """(R, 2) AA jitters for a batch of (pixel, sample) keys."""
    return jax.vmap(aa_jitter)(keys)
