"""Offline study: lockstep visits vs SUB-WARP WIDTH on bounce rays,
with the brute prime — the other axis of the kernel cost model
(tree_shape_study.py covers tree shape at fixed width 128).

Per-iteration kernel cost ~= fixed + per-chain * n_subwarps, so halving
the width doubles chains per 1024 rays; this measures how much the
union-of-visits shrinks in exchange. Also prints the DIRECTION-OCTANT
SORTED variant per width: the upper bound of what in-wavefront ray
sorting could save (the kernel itself cannot permute lanes).

CPU-only. Usage: python scripts/width_study.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tree_shape_study import collapse_k, packet_visits, prime


def setup():
    from raytracer_tpu.camera import make_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scene.builder import reference_scene, partition_brute_faces
    from raytracer_tpu.ops.bvh import build_lbvh
    from raytracer_tpu.utils import rng as rngu
    import jax.numpy as jnp
    import dataclasses

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    brute_tri = np.asarray(scene.bvh4.brute_tri)
    mesh = scene.mesh
    _, keep = partition_brute_faces(mesh)
    dense = dataclasses.replace(
        mesh, faces=jnp.asarray(np.asarray(mesh.faces)[keep]),
        face_mat=jnp.asarray(np.asarray(mesh.face_mat)[keep]))
    bvh = build_lbvh(dense)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    prim_index = np.asarray(bvh.prim_index)
    n_int = left.shape[0]
    t = n_int + 1
    lo = np.zeros(2 * t - 1, np.int64)
    hi = np.zeros(2 * t - 1, np.int64)
    lo[n_int:] = np.arange(t)
    hi[n_int:] = np.arange(t)
    for _ in range(64):
        nl = np.minimum(lo[left], lo[right])
        nh = np.maximum(hi[left], hi[right])
        if (nl == lo[:n_int]).all() and (nh == hi[:n_int]).all():
            break
        lo[:n_int] = nl
        hi[:n_int] = nh
    count = hi - lo + 1
    verts = np.asarray(dense.vertices)
    faces = np.asarray(dense.faces)[prim_index]
    v0 = verts[faces[:, 0]]
    tri = np.concatenate([v0, verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0],
                         axis=1).astype(np.float32)

    cfg = RenderConfig(width=2560, height=1440, spp=1, max_bounces=20)
    cam = make_camera(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                      aperture=cfg.aperture, position=(0.0, 0.1, 0.28), pitch=-8.0)
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    px, py, _ = _tiled_pixel_grid(cfg)
    lanes_per_tile_row = (2560 // 128) * 1024
    lo_l = (704 // 8) * lanes_per_tile_row
    sel = slice(lo_l, lo_l + 16384)
    keys = rngu.lane_keys(jax.random.key(0), py[sel] * cfg.width + px[sel])
    o, d = generate_rays(cam, px[sel], py[sel], cfg.width, cfg.height, keys)
    o = np.asarray(o)
    d = np.asarray(d)

    from raytracer_tpu.ops.intersect import intersect_scene, shade_hit
    ids = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d), 1e-3)
    at = shade_hit(scene, jnp.asarray(o), jnp.asarray(d), ids)
    hit = np.asarray(ids.hit)
    p = np.asarray(at.point)[hit]
    nrm = np.asarray(at.normal)[hit]
    rng = np.random.default_rng(1)
    u = rng.normal(size=p.shape).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    bd = nrm + u
    bd /= np.maximum(np.linalg.norm(bd, axis=1, keepdims=True), 1e-9)
    bo = p + 1e-4 * nrm
    m = (bo.shape[0] // 1024) * 1024
    return brute_tri, left, right, count, lo, node_min, node_max, tri, bo[:m], bd[:m]


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()
    bo, bd = bo[:8192], bd[:8192]

    shapes = [(4, 8), (8, 8)]
    widths = (256, 128, 64, 32, 16)
    for K, max_leaf in shapes:
        bounds, children = collapse_k(left, right, count, lo, node_min, node_max,
                                      K, max_leaf)
        for order in ("tile", "octsort", "globalsort"):
            if order == "globalsort":
                # GLOBAL sort over the whole wavefront: direction octant,
                # then Morton code of the origin — what a cross-packet
                # per-bounce sort could achieve (costs ~2 permutes/bounce
                # in XLA; measure before building).
                oct_ = ((bd[:, 0] < 0).astype(np.int64) * 4
                        + (bd[:, 1] < 0).astype(np.int64) * 2
                        + (bd[:, 2] < 0).astype(np.int64))
                lo_w = bo.min(axis=0)
                ext = np.maximum(bo.max(axis=0) - lo_w, 1e-9)
                q = np.minimum(((bo - lo_w) / ext * 1024).astype(np.int64), 1023)

                def spread(x):
                    x = (x | (x << 16)) & 0x030000FF
                    x = (x | (x << 8)) & 0x0300F00F
                    x = (x | (x << 4)) & 0x030C30C3
                    x = (x | (x << 2)) & 0x09249249
                    return x

                morton = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
                          | (spread(q[:, 2]) << 2))
                idx = np.argsort(oct_ * (1 << 30) + morton, kind="stable")
                ro = bo[idx]
                rd = bd[idx]
            elif order == "octsort":
                # Sort within each 1024-ray packet by direction octant then
                # dominant-axis angle — what an in-wavefront per-packet
                # permute could achieve (keeps packets screen-local).
                ro = np.empty_like(bo)
                rd = np.empty_like(bd)
                for i in range(0, bo.shape[0], 1024):
                    oct_ = ((bd[i:i + 1024, 0] < 0).astype(int) * 4
                            + (bd[i:i + 1024, 1] < 0).astype(int) * 2
                            + (bd[i:i + 1024, 2] < 0).astype(int))
                    key = oct_ * 10 + np.argmax(np.abs(bd[i:i + 1024]), axis=1)
                    idx = np.argsort(key, kind="stable")
                    ro[i:i + 1024] = bo[i:i + 1024][idx]
                    rd[i:i + 1024] = bd[i:i + 1024][idx]
            else:
                ro, rd = bo, bd
            tp = prime(brute_tri, ro, rd)
            row = [f"bvh{K}/leaf{max_leaf} {order:8s}"]
            for w in widths:
                ti = tl = 0
                for i in range(0, ro.shape[0], w):
                    vi, vl, _ = packet_visits(bounds, children, tri,
                                              ro[i:i + w], rd[i:i + w], tp[i:i + w])
                    ti += vi
                    tl += vl
                n_sub = ro.shape[0] // w
                per_sub = (ti + tl) / n_sub
                chains = 1024 // w
                row.append(f"w{w}: {per_sub:6.1f}v x{chains}ch")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
