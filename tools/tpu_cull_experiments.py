"""Cull-pass formulation shootout on TPU: current scan+any vs MXU
dot-reduction vs bf16 variants.  Informs the _cull_rows implementation."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chiaroscuro_tpu.accel.clusters import build_clusters
from chiaroscuro_tpu.geometry.camera import camera_basis, primary_ray_dirs_planar
from chiaroscuro_tpu.ops import cluster_pallas as cp
from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.scene_arrays import load_scene

REF = "/root/reference"


def timed(tag, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<46s} {best * 1e3:8.2f} ms")
    return out, best


# --- Pallas cull kernel: measured-slower alternative, kept for the record ---
# Moved out of ops/cluster_pallas.py (it was never wired in): on v5e/nanosuit
# this kernel is exact vs the XLA cull but 2x slower (52 vs 26 ms per 1M
# rays) -- the per-cluster fori_loop serializes on scalar SMEM box loads +
# a cross-lane reduce per iteration, while the XLA formulation keeps the VPU
# saturated.  That result also proves the cull is VPU/pipeline-bound, NOT
# HBM-bound (this kernel has near-zero HBM traffic and still loses); see
# docs/ROOFLINE.md "cull" section.

from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chiaroscuro_tpu.ops.cluster_pallas import (
    BIG, HUGE_INV, TILE_ROWS)


def _cull_kernel(boxes_ref, o_ref, d_ref, tmax_ref, rowhit_ref, *, KG,
                 with_tmax):
    """Pallas cull: same per-lane slab tests as :func:`_cull_rows`, fused
    in VMEM/registers.

    **Measured-slower alternative, kept for the record (not wired in).**
    On v5e/nanosuit this kernel is exact vs the XLA path but 2x slower
    (52 vs 26 ms per 1M rays): the per-cluster fori_loop serializes on
    scalar SMEM box loads + a cross-lane reduce per iteration, while the
    XLA formulation keeps the VPU saturated.  That result also proves the
    cull is VPU/pipeline-bound, NOT HBM-bound (this kernel has near-zero
    HBM traffic and still loses) — see docs/ROOFLINE.md "cull" section.
    boxes_ref is SMEM (KG*128, 8) rows [bmin xyz | bmax xyz | pad pad];
    rowhit_ref is (TILE_ROWS, KG*128) f32 where lane g*128+j = 1.0 iff any
    ray lane of the row hits box j of group g (padded boxes register hits
    exactly like the XLA path; callers slice [:, :K])."""
    inv = []
    for a in range(3):
        d = d_ref[a]
        mag = jnp.abs(d)
        capped = jnp.where(
            mag * HUGE_INV >= 1.0, 1.0 / jnp.where(mag != 0.0, d, 1.0),
            HUGE_INV,
        )
        inv.append(jnp.where(d < 0, -jnp.abs(capped), jnp.abs(capped)))
    o = [o_ref[a] for a in range(3)]
    tmax = tmax_ref[...] if with_tmax else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)

    for g in range(KG):
        def body(j, acc, g=g):
            cid = g * 128 + j
            near = None
            far = None
            for a in range(3):
                t0 = (boxes_ref[cid, a] - o[a]) * inv[a]
                t1 = (boxes_ref[cid, 3 + a] - o[a]) * inv[a]
                lo = jnp.minimum(t0, t1)
                hi = jnp.maximum(t0, t1)
                near = lo if near is None else jnp.maximum(near, lo)
                far = hi if far is None else jnp.minimum(far, hi)
            hit = (far >= near) & (far >= 0.0)
            if with_tmax:
                hit = hit & (near <= tmax)
            anyrow = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            return acc + anyrow * (lane == j).astype(jnp.float32)

        acc = jax.lax.fori_loop(
            0, 128, body, jnp.zeros((TILE_ROWS, 128), jnp.float32)
        )
        rowhit_ref[:, g * 128:(g + 1) * 128] = acc


@partial(jax.jit, static_argnames=("K", "interpret", "with_tmax"))
def _cull_rowhit_call(o3, d3, tmax, boxes, K, interpret, with_tmax):
    B0 = o3.shape[1]
    KG = boxes.shape[0] // 128
    ray = pl.BlockSpec(
        (3, TILE_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_cull_kernel, KG=KG, with_tmax=with_tmax),
        grid=(B0 // TILE_ROWS,),
        out_shape=jax.ShapeDtypeStruct((B0, KG * 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray, ray, row,
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, KG * 128), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(boxes, o3, d3, tmax)


def _cull_rows_kernelized(o3, d3, boxes, K, Lmax, interpret, tmax=None):
    """Drop-in for :func:`_cull_rows` backed by the Pallas cull kernel.
    Identical (meta, ids) including top_k tie-breaks."""
    o3 = jax.lax.stop_gradient(o3)
    d3 = jax.lax.stop_gradient(d3)
    if tmax is None:
        dummy = jnp.zeros(o3.shape[1:], jnp.float32)
        rowhit = _cull_rowhit_call(
            o3, d3, dummy, boxes, K=K, interpret=interpret, with_tmax=False
        )
    else:
        rowhit = _cull_rowhit_call(
            o3, d3, jax.lax.stop_gradient(tmax), boxes, K=K,
            interpret=interpret, with_tmax=True,
        )
    rowhit = rowhit[:, :K] > 0.0
    count = jnp.sum(rowhit, axis=1).astype(jnp.int32)
    Le = min(Lmax, K)
    _, ids = jax.lax.top_k(rowhit.astype(jnp.int32), Le)
    overflow = count > Le
    trip = jnp.where(overflow, jnp.int32(K), count)
    meta = jnp.stack([trip, overflow.astype(jnp.int32)], axis=1)
    return meta, ids.astype(jnp.int32)


def pack_cull_boxes(bbox_min: np.ndarray, bbox_max: np.ndarray) -> np.ndarray:
    """(K, 3)+(K, 3) -> (ceil(K/128)*128, 8) SMEM rows for the cull kernel;
    padded rows hold inverted boxes (matching the XLA path's padding)."""
    K = bbox_min.shape[0]
    KB = -(-K // 128) * 128
    boxes = np.zeros((KB, 8), np.float32)
    boxes[:K, 0:3] = bbox_min
    boxes[:K, 3:6] = bbox_max
    boxes[K:, 0:3] = BIG
    boxes[K:, 3:6] = -BIG
    return boxes


def main():
    xres = yres = 1024
    cfg = RenderConfig.from_rtc(
        os.path.join(REF, "nanosuit.rtc"),
        ["xres", str(xres), "yres", str(yres), "k", "3"])
    cfg.obj_path = os.path.join(REF, cfg.obj_path)
    scene = load_scene(cfg)
    ca = build_clusters(np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                        np.asarray(scene.tri_v2))
    bmin = jnp.asarray(ca.bbox_min)
    bmax = jnp.asarray(ca.bbox_max)
    K = ca.K
    print(f"K={K}")

    eye = jnp.asarray(cfg.vp, jnp.float32)
    lu, dx, dy = camera_basis(eye, jnp.asarray(cfg.la, jnp.float32),
                              jnp.asarray(cfg.up, jnp.float32),
                              jnp.float32(cfg.yview), xres, yres)
    ys, xs = np.meshgrid(np.arange(yres), np.arange(xres), indexing="ij")
    B0 = xres * yres // 128
    pxf = jnp.asarray(xs.reshape(B0, 128), jnp.float32)
    pyf = jnp.asarray(ys.reshape(B0, 128), jnp.float32)
    z = jnp.zeros_like(pxf)
    d3 = primary_ray_dirs_planar(lu, dx, dy, pxf, pyf, z, z)
    o3 = jnp.broadcast_to(eye[:, None, None], (3, B0, 128))

    Lmax = 128

    @jax.jit
    def current(o3, d3):
        return cp._cull_rows(o3, d3, bmin, bmax, Lmax)

    (meta0, ids0), _ = timed("current (scan CK=32 + any + top_k)", current, o3, d3)

    def make_inv(d3):
        inv = []
        for a in range(3):
            d = d3[a]
            mag = jnp.abs(d)
            capped = jnp.where(mag * cp.HUGE_INV >= 1.0,
                               1.0 / jnp.where(mag > 0, d, 1.0), cp.HUGE_INV)
            inv.append(jnp.where(d < 0, -jnp.abs(capped), jnp.abs(capped)))
        return inv

    ones = jnp.ones((128, 1), jnp.float32)

    def variant_dot(o3, d3, CK):
        inv = make_inv(d3)
        Kp = -(-K // CK) * CK
        pad = Kp - K
        bmn = jnp.concatenate([bmin, jnp.full((pad, 3), cp.BIG)]) if pad else bmin
        bmx = jnp.concatenate([bmax, jnp.full((pad, 3), -cp.BIG)]) if pad else bmax

        def chunk_hit(_, boxes):
            cmn, cmx = boxes
            near = far = None
            for a in range(3):
                t0 = (cmn[:, a][:, None, None] - o3[a][None]) * inv[a][None]
                t1 = (cmx[:, a][:, None, None] - o3[a][None]) * inv[a][None]
                lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                near = lo if near is None else jnp.maximum(near, lo)
                far = hi if far is None else jnp.minimum(far, hi)
            hit = ((far >= near) & (far >= 0.0)).astype(jnp.float32)
            # lane reduction on the MXU instead of a cross-lane any
            cnt = jax.lax.dot_general(
                hit.reshape(-1, 128), ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return _, cnt.reshape(CK, -1) > 0.0

        _, rh = jax.lax.scan(
            chunk_hit, 0, (bmn.reshape(-1, CK, 3), bmx.reshape(-1, CK, 3)))
        return rh.reshape(Kp, -1).T[:, :K]

    for CK in (32, 64):
        @jax.jit
        def dot_ck(o3, d3, CK=CK):
            rowhit = variant_dot(o3, d3, CK)
            count = jnp.sum(rowhit, axis=1).astype(jnp.int32)
            Le = min(Lmax, K)
            _, ids = jax.lax.top_k(rowhit.astype(jnp.int32), Le)
            overflow = count > Le
            trip = jnp.where(overflow, jnp.int32(K), count)
            return jnp.stack([trip, overflow.astype(jnp.int32)], axis=1), ids

        (meta1, ids1), _ = timed(f"dot-reduce CK={CK} + top_k", dot_ck, o3, d3)
        np.testing.assert_array_equal(np.asarray(meta0), np.asarray(meta1))
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    print("dot variants exact vs current")

    # scan-free: one fused (Kp, B0, 128) formulation, no lax.scan
    Kp1 = -(-K // 8) * 8

    @jax.jit
    def noscan(o3, d3):
        inv = make_inv(d3)
        pad = Kp1 - K
        bmn = jnp.concatenate([bmin, jnp.full((pad, 3), cp.BIG)]) if pad else bmin
        bmx = jnp.concatenate([bmax, jnp.full((pad, 3), -cp.BIG)]) if pad else bmax
        near = far = None
        for a in range(3):
            t0 = (bmn[:, a][:, None, None] - o3[a][None]) * inv[a][None]
            t1 = (bmx[:, a][:, None, None] - o3[a][None]) * inv[a][None]
            lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
            near = lo if near is None else jnp.maximum(near, lo)
            far = hi if far is None else jnp.minimum(far, hi)
        hit = ((far >= near) & (far >= 0.0)).astype(jnp.float32)
        cnt = jax.lax.dot_general(hit.reshape(-1, 128), ones,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rowhit = cnt.reshape(Kp1, -1).T[:, :K] > 0.0
        count = jnp.sum(rowhit, axis=1).astype(jnp.int32)
        Le = min(Lmax, K)
        _, ids = jax.lax.top_k(rowhit.astype(jnp.int32), Le)
        overflow = count > Le
        trip = jnp.where(overflow, jnp.int32(K), count)
        return jnp.stack([trip, overflow.astype(jnp.int32)], axis=1), ids

    (meta2, ids2), _ = timed("dot-reduce scan-free (full K)", noscan, o3, d3)
    np.testing.assert_array_equal(np.asarray(meta0), np.asarray(meta2))
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids2))
    print("scan-free exact vs current")

    # Pallas cull kernel (for the record; defined above)
    boxes = jnp.asarray(pack_cull_boxes(ca.bbox_min, ca.bbox_max))

    @jax.jit
    def kern(o3, d3):
        return _cull_rows_kernelized(o3, d3, boxes, K, Lmax, False)

    (meta3, ids3), _ = timed("pallas cull kernel + top_k", kern, o3, d3)
    np.testing.assert_array_equal(np.asarray(meta0), np.asarray(meta3))
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids3))
    print("pallas kernel exact vs current")


if __name__ == "__main__":
    main()

