"""Wavefront path-tracing integrator.

The reference integrates with per-pixel recursion + Russian-roulette early
``return`` (``src/rayTracer.cpp:76-135``).  On TPU, data-dependent recursion
does not exist under ``jit``; instead we run a **wavefront**: all rays advance
through a ``lax.scan`` over bounce index with an active mask, and terminated
lanes simply stop contributing.  The estimator is mathematically identical —
NEE + cosine-BSDF sampling + RR become masked updates of (throughput, L).

Reference semantics preserved exactly (required for allclose parity):
- emission only on *primary* hits, weighted by max(0, dot(wo, n))
  (``rayTracer.cpp:85``) — secondary light hits contribute only via NEE;
- NEE geometric term max(0, cos_i * cos_l) / (1 + d^2) — the reference's
  nonstandard falloff (``rayTracer.cpp:106``);
- NEE weight = area * n_lights (uniform light pick, pdf 1/n_lights;
  ``rayTracer.cpp:108``), light point from v0 ~ U(0,1), v1 ~ U(0, 1-v0)
  (``rayTracer.cpp:96-97`` — *not* uniform over the triangle; preserved);
- shadow ray from hit + 1e-3 * n with tmax = distance, excluding the sampled
  light triangle id (``rayTracer.cpp:104``, ``kdtree.cpp:322-331``);
- Russian roulette on Kmax = max(f.rgb) = max(Kd)/pi, survival iff
  u <= Kmax, throughput *= f * |cos| / (pdf * Kmax) (``rayTracer.cpp:124-131``);
- depth cap k == K stops after direct lighting (``rayTracer.cpp:113-116``);
- miss at any depth contributes throughput * background
  (``rayTracer.cpp:134``);
- flat per-triangle normal = mean of vertex normals, used raw
  (``kdtree.cpp:58-60``), hit point from barycentric interpolation
  (``rayTracer.cpp:150-151``).

Intersectors are injected (``closest_fn``, ``any_fn``) so the same integrator
drives the brute-force oracle, the BVH traversal, and the Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chiaroscuro_tpu.geometry.intersect import AnyFn, ClosestFn, ClosestHit  # noqa: F401
from chiaroscuro_tpu.sampling import prng
from chiaroscuro_tpu.sampling.samplers import (
    M_1_PI,
    phong_pdf,
    reflect,
    sample_phong_lobe,
    sample_wi_diffuse,
)
from chiaroscuro_tpu.scene.scene_arrays import (
    BRDF_EMISSIVE,
    BRDF_PHONG,
    SceneArrays,
)

EPS_OFFSET = jnp.float32(1.0e-3)  # rayTracer.cpp:104,130


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n == 0.0, 1.0, n)


def _interp_uv(scene: SceneArrays, tid, u, v):
    w = 1.0 - u - v
    return (
        scene.uv0[tid] * w[..., None]
        + scene.uv1[tid] * u[..., None]
        + scene.uv2[tid] * v[..., None]
    )


def _atlas_fetch(scene: SceneArrays, tex_id, uv, fallback):
    """Nearest-texel fetch with repeat wrap from the flat atlas, or
    ``fallback`` where ``tex_id < 0``.

    Wrap semantics mirror the reference's while-loop wrap (``mesh.cpp:21-35``):
    fractional part, except exactly-integral coords > 0 map to 1.0 (then
    clamped to the last texel — the reference reads out of bounds there; we
    clamp, a conscious divergence documented in SURVEY.md §7).
    """
    if scene.tex_data.shape[0] <= 1:
        # Untextured scene (the atlas holds only the dummy texel): the fetch
        # is statically a no-op — skip the gathers entirely.
        return fallback
    safe_id = jnp.maximum(tex_id, 0)
    tw = scene.tex_width[safe_id]
    th = scene.tex_height[safe_id]
    off = scene.tex_offset[safe_id]

    def wrap(c):
        f = c - jnp.floor(c)
        return jnp.where((f == 0.0) & (c > 0.0), 1.0, f)

    x = jnp.minimum((wrap(uv[..., 0]) * tw).astype(jnp.int32), tw - 1)
    y = jnp.minimum((wrap(uv[..., 1]) * th).astype(jnp.int32), th - 1)
    texel = scene.tex_data[off + y * tw + x]
    return jnp.where((tex_id >= 0)[..., None], texel, fallback)


def texture_kd_lookup(scene: SceneArrays, tid, u, v):
    """Diffuse albedo at a hit (``rayTracer.cpp:153-157``)."""
    return _atlas_fetch(
        scene, scene.tex_id[tid], _interp_uv(scene, tid, u, v), scene.kd[tid]
    )


def texture_ks_lookup(scene: SceneArrays, tid, u, v):
    """Specular reflectance at a hit (Phong extension; the reference loads
    specular maps but uses them only in its raster preview, ``mesh.cpp:54-62``)."""
    return _atlas_fetch(
        scene, scene.tex_id_ks[tid], _interp_uv(scene, tid, u, v), scene.ks[tid]
    )


def trace_paths(
    scene: SceneArrays,
    origins: jax.Array,       # (R, 3) ray origins (camera eye, broadcast)
    dirs: jax.Array,          # (R, 3) primary directions (may be unnormalized)
    keys: jax.Array,          # (R, 2/4) per-(pixel,sample) PRNG keys
    depth: int,               # scene.k — max path vertices
    background: jax.Array,    # (3,)
    closest_fn: ClosestFn,
    any_fn: AnyFn,
) -> jax.Array:
    """Estimate radiance for R primary rays. Returns (R, 3)."""
    R = origins.shape[0]
    n_lights = scene.n_lights

    if n_lights > 0:
        # Compact per-light table, derived *inside the traced graph* (so
        # gradients flow from NEE into ke and vertex positions).  One tiny
        # (L,)-row gather per trace, then per-ray fetches hit the small table
        # via a one-hot matmul (MXU) instead of HBM row-gathers.
        lids = scene.light_ids
        light_table = jnp.concatenate(
            [
                scene.tri_v0[lids],
                scene.tri_v1[lids],
                scene.tri_v2[lids],
                scene.normal[lids],
                scene.ke[lids],
                scene.light_areas[:, None],
            ],
            axis=1,
        )  # (L, 16)

    def bounce(state, k):
        origin, direction, throughput, radiance, active = state

        res = closest_fn(origin, direction)
        hit, tid, bu, bv = res.hit, res.tid, res.u, res.v
        hit = hit & active

        # Miss -> background, terminate (rayTracer.cpp:134).
        radiance = radiance + jnp.where(
            (active & ~hit)[:, None], throughput * background[None, :], 0.0
        )

        # Hit resolution (rayTracer.cpp:148-166).  When the intersector
        # pre-fetched shading attributes in-kernel (MXU one-hot matmul; see
        # ops/intersect_pallas.py), use them; otherwise gather by tid.
        w = 1.0 - bu - bv
        A = res.attrs
        if A is not None:
            # v0*(1-u-v) + v1*u + v2*v == v0 + u*e1 + v*e2 exactly in algebra;
            # fp association differs at ~ulp scale.
            point = A["v0"] + bu[:, None] * A["e1"] + bv[:, None] * A["e2"]
            normal = A["normal"]
            uv_hit = (
                A["uv0"] * w[:, None]
                + A["uv1"] * bu[:, None]
                + A["uv2"] * bv[:, None]
            )
            kd = _atlas_fetch(scene, A["texid"], uv_hit, A["kd"])
            ke_hit = A["ke"]
            btype = A["btype"]
        else:
            point = (
                scene.tri_v0[tid] * w[:, None]
                + scene.tri_v1[tid] * bu[:, None]
                + scene.tri_v2[tid] * bv[:, None]
            )
            normal = scene.normal[tid]
            kd = texture_kd_lookup(scene, tid, bu, bv)
            ke_hit = scene.ke[tid]
            btype = scene.brdf_type[tid]
        wo = _normalize(origin - point)
        f_brdf = kd * M_1_PI  # Diffuse::f (brdf.cpp:70)

        if scene.has_specular:
            # Phong extension state (never active in reference-parity mode).
            is_phong = btype == BRDF_PHONG
            if A is not None:
                ks = _atlas_fetch(scene, A["texid_ks"], uv_hit, A["ks"])
                ns = A["ns"]
            else:
                ks = texture_ks_lookup(scene, tid, bu, bv)
                ns = scene.shininess[tid]
            n_unit = _normalize(normal)
            wr = reflect(wo, n_unit)
            spec_norm = (ns + 2.0) * (0.5 * M_1_PI)

            def phong_f(wi_dir):
                """Full BRDF value f(wi, wo) = Kd/pi + Ks (ns+2)/2pi cos^ns."""
                cos_r = jnp.maximum(0.0, _dot(wr, wi_dir))
                spec = ks * (spec_norm * jnp.power(cos_r, ns))[:, None]
                return f_brdf + jnp.where(is_phong[:, None], spec, 0.0)

        emitted = jnp.where((btype == BRDF_EMISSIVE)[:, None], ke_hit, 0.0)
        direct = jnp.where(
            k == 1,
            emitted * jnp.maximum(0.0, _dot(wo, normal))[:, None],
            jnp.zeros_like(emitted),
        )

        un = prng.bounce_uniforms_batch(keys, k)  # (R, N_BOUNCE_DIMS)

        if n_lights > 0:
            li = jnp.minimum(
                (un[:, prng.DIM_LIGHT_SEL] * n_lights).astype(jnp.int32),
                n_lights - 1,
            )
            ltid = scene.light_ids[li]
            if n_lights <= 512:
                onehot = (
                    li[:, None]
                    == jnp.arange(n_lights, dtype=jnp.int32)[None, :]
                ).astype(jnp.float32)
                lrow = onehot @ light_table                     # (R, 16)
            else:
                lrow = light_table[li]
            lv0 = lrow[:, 0:3]
            lv1 = lrow[:, 3:6]
            lv2 = lrow[:, 6:9]
            lnormal = lrow[:, 9:12]
            lke = lrow[:, 12:15]
            larea = lrow[:, 15]

            # v0 ~ U(0,1), v1 ~ U(0, 1-v0)  (rayTracer.cpp:96-97)
            b0 = un[:, prng.DIM_LIGHT_U]
            b1 = un[:, prng.DIM_LIGHT_V] * (1.0 - b0)
            lpoint = (
                b0[:, None] * lv0
                + b1[:, None] * lv1
                + (1.0 - b0 - b1)[:, None] * lv2
            )

            to_light = lpoint - point
            dist = jnp.linalg.norm(to_light, axis=-1)
            wl = _normalize(to_light)

            occluded = any_fn(point + EPS_OFFSET * normal, wl, dist, ltid)

            geometric = jnp.maximum(
                0.0,
                _dot(normal, wl) * _dot(-wl, lnormal) / (1.0 + dist * dist),
            )
            f_nee = phong_f(wl) if scene.has_specular else f_brdf
            nee = lke * (geometric * larea * n_lights)[:, None] * f_nee
            direct = direct + jnp.where((~occluded)[:, None], nee, 0.0)

        radiance = radiance + jnp.where(hit[:, None], throughput * direct, 0.0)

        # Extend the path (rayTracer.cpp:119-131).
        wi, pdf = sample_wi_diffuse(
            normal, un[:, prng.DIM_BSDF_U], un[:, prng.DIM_BSDF_V]
        )
        if not scene.has_specular:
            kmax = jnp.max(f_brdf, axis=-1)
            survive = (pdf > 0.0) & (un[:, prng.DIM_RR] <= kmax)
            cosine = jnp.abs(_dot(normal, wi))
            scale = f_brdf * (
                cosine / jnp.where(pdf > 0.0, pdf * kmax, 1.0)
            )[:, None]
        else:
            # Mixture sampling: diffuse cosine lobe vs Phong lobe, chosen with
            # probability p_spec = maxKs / (maxKd + maxKs); MIS-free one-sample
            # estimator with the mixture pdf.  Non-Phong lanes reduce exactly
            # to the reference path (p_spec = 0).
            max_kd = jnp.max(kd, axis=-1)
            max_ks = jnp.max(ks, axis=-1)
            p_spec = jnp.where(
                is_phong, max_ks / jnp.maximum(max_kd + max_ks, 1e-8), 0.0
            )
            wi_s, _ = sample_phong_lobe(
                wr, ns, un[:, prng.DIM_BSDF_U], un[:, prng.DIM_BSDF_V]
            )
            choose_spec = un[:, prng.DIM_LOBE] < p_spec
            wi = jnp.where(choose_spec[:, None], wi_s, wi)

            pdf_d = jnp.maximum(0.0, _dot(normal, wi)) * M_1_PI
            pdf_s = phong_pdf(wr, wi, ns)
            pdf_mix = (1.0 - p_spec) * pdf_d + p_spec * pdf_s

            f_at_wi = phong_f(wi)
            # Survival: reference's Kmax for pure-diffuse lanes; energy-bounded
            # clamp for Phong lanes.  Specular lobes below the surface are
            # treated as absorbed.
            q = jnp.where(
                is_phong,
                jnp.clip(max_kd + max_ks, 0.05, 0.95),
                jnp.max(f_brdf, axis=-1),
            )
            above = _dot(n_unit, wi) > 0.0
            survive = (pdf_mix > 0.0) & (un[:, prng.DIM_RR] <= q)
            survive = survive & (above | ~is_phong)
            cosine = jnp.abs(_dot(normal, wi))
            scale = f_at_wi * (
                cosine / jnp.where(pdf_mix > 0.0, pdf_mix * q, 1.0)
            )[:, None]

        new_active = hit & survive & (k < depth)
        throughput = jnp.where(new_active[:, None], throughput * scale, throughput)
        origin = jnp.where(hit[:, None], point + EPS_OFFSET * normal, origin)
        direction = jnp.where(new_active[:, None], wi, direction)

        return (origin, direction, throughput, radiance, new_active), None

    init = (
        origins,
        dirs,
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        jnp.ones((R,), bool),
    )
    (_, _, _, radiance, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(1, depth + 1)
    )
    return radiance
