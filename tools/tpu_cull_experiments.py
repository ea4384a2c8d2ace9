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

    # Pallas cull kernel (for the record)
    from chiaroscuro_tpu.ops.cluster_pallas import (
        _cull_rows_kernelized, pack_cull_boxes)
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

