"""[HISTORICAL — r4/r5 evidence] Profiles the two-level supercluster
(hier) cull DELETED in r5 (flat + wide lists won 2.3x at K=23k; see
docs/ROOFLINE.md).  Kept as the measured record behind the r4 ROOFLINE
sponza section; does NOT run against current HEAD.

Sponza-scale (atrium) cluster-intersector profile: per-bounce trip/
overflow histograms + kernel-config timings.  Feeds docs/ROOFLINE.md's
sponza section (VERDICT r3 ask #1: measure before attacking).

Ray populations are generated like the real integrator's: primary rays at
the ATRIUM_CAMERA, then per-bounce cosine-sampled continuations at the
actual hit points, plus NEE shadow rays toward sampled ceiling panels —
so the cull statistics reflect the real coherence structure per bounce.
"""

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
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays
from chiaroscuro_tpu.scene.synthetic import ATRIUM_CAMERA, atrium


def timed(tag, fn, *args, iters=2):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<52s} {best * 1e3:9.2f} ms", flush=True)
    return out, best


def trip_stats(tag, meta, K):
    trips = np.asarray(meta[:, 0])
    over = np.asarray(meta[:, 1])
    n = len(trips)
    real = trips[over == 0]
    print(
        f"  {tag}: trips p50={np.median(real) if len(real) else 0:.0f} "
        f"p90={np.percentile(real, 90) if len(real) else 0:.0f} "
        f"p99={np.percentile(real, 99) if len(real) else 0:.0f} "
        f"max={real.max() if len(real) else 0} | overflow {over.sum()}/{n} "
        f"rows ({100 * over.mean():.1f}%) -> {over.sum() * K} forced visits "
        f"vs {real.sum()} listed", flush=True,
    )


def main(target_tris=480_000, xres=1280, yres=720):
    print("devices:", jax.devices(), flush=True)
    scene = build_scene_arrays(atrium(target_tris))
    ca = build_clusters(
        np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
        np.asarray(scene.tri_v2),
    )
    K = ca.K
    print(f"tris={scene.n_tris} K={K} KS={ca.KS} "
          f"packed={K * cp.PACK_W * ca.M * 4 / 2**20:.0f} MB", flush=True)

    cam = ATRIUM_CAMERA
    eye = jnp.asarray(cam["eye"], jnp.float32)
    lu, dxv, dyv = camera_basis(
        eye, jnp.asarray(cam["center"], jnp.float32),
        jnp.asarray(cam["up"], jnp.float32),
        jnp.float32(cam["yview"]), xres, yres,
    )
    ys, xs = np.meshgrid(np.arange(yres), np.arange(xres), indexing="ij")
    B0 = xres * yres // 128
    pxf = jnp.asarray(xs.reshape(B0, 128), jnp.float32)
    pyf = jnp.asarray(ys.reshape(B0, 128), jnp.float32)
    z = jnp.zeros_like(pxf)
    d3 = primary_ray_dirs_planar(lu, dxv, dyv, pxf, pyf, z, z)
    o3 = jnp.broadcast_to(eye[:, None, None], (3, B0, 128))

    # --- cull stats per ray population -----------------------------------
    sup_min = np.asarray(ca.super_min, np.float32)
    sup_max = np.asarray(ca.super_max, np.float32)
    G, KS = ca.G, ca.KS
    kid_min = np.full((KS * G, 3), cp.BIG, np.float32)
    kid_max = np.full((KS * G, 3), -cp.BIG, np.float32)
    kid_min[:K] = ca.bbox_min
    kid_max[:K] = ca.bbox_max

    def cull_hier(o3, d3, Lmax=128, Lsup=16):
        return cp._cull_rows_hier(
            o3, d3, sup_min, sup_max,
            kid_min.reshape(KS, G, 3), kid_max.reshape(KS, G, 3),
            K=K, Lmax=Lmax, Lsup=Lsup,
        )

    cull_j = jax.jit(cull_hier, static_argnames=())

    # Supercluster-count stats too (to size Lsup / judge the super tier).
    def sup_counts(o3, d3):
        rh = cp._rowhit_scan(o3, cp._safe_inv(d3), sup_min, sup_max)
        return jnp.sum(rh, axis=1)

    sup_j = jax.jit(sup_counts)

    # intersectors (stream, hier) as the bench runs them
    closest_fn, any_fn = cp.make_cluster_intersectors(
        scene, clusters=ca, interpret=False, stream=True, hier=True)
    closest_j = jax.jit(lambda o, d: closest_fn.planar_fn(o, d))

    rng = np.random.default_rng(7)
    rays = {"primary": (o3, d3)}

    cur_o, cur_d = o3, d3
    for b in range(1, 3):
        res = closest_j(cur_o, cur_d)
        hit = np.asarray(res.hit)
        t = np.asarray(res.t)
        tid = np.asarray(res.tid)
        # hit points + normals (host-side, gathered from scene arrays)
        o_np = np.asarray(cur_o)
        d_np = np.asarray(cur_d)
        pt = o_np + t[None] * d_np
        nrm = np.asarray(scene.normal)[tid]                 # (B0, 128, 3)
        nrm = np.moveaxis(nrm, -1, 0)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=0), 1e-9)[None]
        # cosine-sample about the normal
        u1 = rng.random(hit.shape).astype(np.float32)
        u2 = rng.random(hit.shape).astype(np.float32)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        # tangent frame
        a = np.where(np.abs(nrm[0]) < 0.9, 1.0, 0.0)
        tang = np.stack([a, 1.0 - a, np.zeros_like(a)])
        tang = np.cross(nrm, tang, axis=0)
        tang /= np.maximum(np.linalg.norm(tang, axis=0), 1e-9)[None]
        bit = np.cross(nrm, tang, axis=0)
        wi = (
            tang * (r * np.cos(phi))[None]
            + bit * (r * np.sin(phi))[None]
            + nrm * np.sqrt(np.maximum(0.0, 1.0 - u1))[None]
        )
        # park dead lanes like the integrator (beyond +x, pointing +x)
        park_x = float(np.asarray(scene.world_max)[0]) * 2 + 1
        alive = hit
        new_o = np.where(alive[None], pt + 1e-3 * nrm, park_x)
        new_d = np.where(alive[None], wi, np.array([1.0, 0, 0])[:, None, None])
        # NEE shadow rays from these hit points toward a random light tri
        lids = np.asarray(scene.light_ids)
        li = rng.integers(0, len(lids), hit.shape)
        lt = lids[li]
        lv0 = np.moveaxis(np.asarray(scene.tri_v0)[lt], -1, 0)
        lv1 = np.moveaxis(np.asarray(scene.tri_v1)[lt], -1, 0)
        lv2 = np.moveaxis(np.asarray(scene.tri_v2)[lt], -1, 0)
        b0 = rng.random(hit.shape).astype(np.float32)
        b1 = (rng.random(hit.shape) * (1 - b0)).astype(np.float32)
        lp = lv0 * b0[None] + lv1 * b1[None] + lv2 * (1 - b0 - b1)[None]
        sd = lp - new_o
        sd = np.where(alive[None], sd, np.array([1.0, 0, 0])[:, None, None])
        rays[f"bounce{b}"] = (jnp.asarray(new_o, jnp.float32),
                              jnp.asarray(new_d, jnp.float32))
        rays[f"shadow{b}"] = (jnp.asarray(new_o, jnp.float32),
                              jnp.asarray(sd, jnp.float32))
        cur_o = rays[f"bounce{b}"][0]
        cur_d = rays[f"bounce{b}"][1]
        print(f"bounce{b}: alive {100 * alive.mean():.0f}% of lanes, "
              f"{100 * np.any(alive, 1).mean():.0f}% of rows", flush=True)

    for tag, (o, d) in rays.items():
        (meta, _), tc = timed(f"hier cull [{tag}]", cull_j, o, d)
        trip_stats(tag, meta, K)
        sc = np.asarray(sup_j(o, d))
        print(f"  {tag}: supers hit p50={np.median(sc):.0f} "
              f"p90={np.percentile(sc, 90):.0f} max={sc.max()} "
              f"(Lsup=16 overflow {100 * (sc > 16).mean():.2f}%)", flush=True)

    # --- kernel timings ---------------------------------------------------
    for tag, (o, d) in rays.items():
        timed(f"stream closest [{tag}]", closest_j, o, d)

    # resident variant (packed = 88 MB; VMEM limit is 110 MB — does it fit?)
    try:
        cf_res, _ = cp.make_cluster_intersectors(
            scene, clusters=ca, interpret=False, stream=False, hier=True)
        cj = jax.jit(lambda o, d: cf_res.planar_fn(o, d))
        for tag in ("primary", "bounce2"):
            timed(f"RESIDENT closest [{tag}]", cj, *rays[tag])
    except Exception as e:
        print(f"resident at 88 MB failed: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- XLA attr-gather cost (slim-pack design experiment) ---------------
    from chiaroscuro_tpu.ops.intersect_pallas import _prep_attrs

    attrT = jnp.asarray(_prep_attrs(scene, 1, np))          # (32, T)
    res = closest_j(*rays["primary"])
    tid = res.tid

    @jax.jit
    def gather_attrs(tid):
        return attrT[:, tid]                                # (32, B0, 128)

    timed("XLA attr gather (32 x 921k rays)", gather_attrs, tid)

    @jax.jit
    def gather_attrs_rowmajor(tid):
        return jnp.take(attrT.T, tid.reshape(-1), axis=0)   # (R, 32)

    timed("XLA attr gather row-major take", gather_attrs_rowmajor, tid)


if __name__ == "__main__":
    main()
