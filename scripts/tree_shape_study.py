"""Offline study: lockstep traversal iterations vs TREE SHAPE (branching
factor, leaf size), on realistic rays WITH the two-level brute prime.

The kernel's frame cost ~= (instructions/iteration) x (lockstep
iterations). kernel_load_probe.py / kernel_ablate.py calibrate the
first factor; this script measures the second for candidate shapes:

  bvh4/leaf8   — current production shape
  bvh4/leaf16  — half the leaves, one level shallower, 2-row leaf visits
  bvh8/leaf8   — one level shallower, 8 slabs + bigger sort per visit
  bvh8/leaf16  — both

All shapes are built by collapsing the SAME binary LBVH (so leaf
contents and SAH quality are comparable); visits are counted per
128-ray sub-warp (the kernel's lockstep unit) with t_best primed by the
brute-force pre-pass triangles, exactly like the kernel. Rays: interior
camera band + bounce-1 diffuse in tiled lane order (the wavefront's
actual order). CPU-only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def collapse_k(left, right, count, lo, node_min, node_max, K, max_leaf):
    """Collapse a binary tree into a K-wide tree with leaf ranges of up
    to max_leaf sorted slots. Returns (bounds [N,K,6], children [N,K])
    with the same encoding as ops/bvh4 (code = -(2+lo*8+(count-1)) is
    NOT used here; leaves are (lo, count) tuples resolved by the sim)."""
    n_int = left.shape[0]

    def expand(node):
        """Greedily expand binary children until K slots or all leaves."""
        slots = [int(node)]
        while len(slots) < K:
            # expand the internal slot with the largest count
            cand = [i for i, c in enumerate(slots)
                    if c < n_int and count[c] > max_leaf]
            if not cand:
                break
            i = max(cand, key=lambda i: count[slots[i]])
            c = slots.pop(i)
            if len(slots) + 2 > K:
                slots.insert(i, c)
                break
            slots.extend((int(left[c]), int(right[c])))
        return slots

    ids = {}
    order = []
    t = n_int + 1
    if count[0] <= max_leaf:
        return (np.zeros((1, K, 6), np.float32),
                [[("leaf", int(lo[0]), int(count[0]))] + [None] * (K - 1)])
    queue = [0]
    ids[0] = 0
    order.append(0)
    kids = {}
    while queue:
        node = queue.pop()
        ch = []
        for c in expand(node):
            if c < n_int and count[c] > max_leaf:
                if c not in ids:
                    ids[c] = len(order)
                    order.append(c)
                    queue.append(c)
                ch.append(("int", c))
            else:
                ch.append(("leaf", int(lo[c]), int(count[c])))
        kids[node] = ch
    n = len(order)
    bounds = np.full((n, K, 6), np.nan, np.float32)
    children = []
    for idx, node in enumerate(order):
        ch = kids[node]
        row = []
        for slot, c in enumerate(ch):
            b = c[1]
            bounds[idx, slot, 0:3] = node_min[b] if c[0] == "int" else node_min[b]
            # for leaves, b indexes the BINARY node; min/max arrays cover all
            bounds[idx, slot, 3:6] = node_max[b]
            row.append(("int", ids[c[1]]) if c[0] == "int" else c)
        row += [None] * (K - len(row))
        children.append(row)
    return bounds, children


def packet_visits(bounds, children, tri, o, d, t_prime, t_min=1e-3):
    """Lockstep sim: ordered any-hit descent over the K-wide tree; one
    node or one leaf-ROW-GROUP visit per iteration per sub-warp.
    Leaf visits are counted in 8-slot rows (rows = ceil(count/8)
    iterations if leaf_rows_split else 1)."""
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    t_best = t_prime.copy()
    vi = vl = 0
    stack = [("int", 0)]
    while stack:
        kind = stack.pop()
        if kind[0] == "leaf":
            _, lo_, cnt = kind
            vl += (cnt + 7) // 8  # one iteration per 8-aligned row
            for k in range(cnt):
                v0, e1, e2 = tri[lo_ + k, 0:3], tri[lo_ + k, 3:6], tri[lo_ + k, 6:9]
                h = np.cross(d, e2)
                a = (e1 * h).sum(-1)
                ok = np.abs(a) >= 1e-8
                f = 1.0 / np.where(ok, a, 1.0)
                s = o - v0
                u = f * (s * h).sum(-1)
                ok &= (u >= 0) & (u <= 1)
                q = np.cross(s, e1)
                v = f * (d * q).sum(-1)
                ok &= (v >= 0) & (u + v <= 1)
                t = f * (e2 * q).sum(-1)
                ok &= (t >= t_min) & (t < t_best)
                t_best = np.where(ok, t, t_best)
            continue
        vi += 1
        node = kind[1]
        ch = children[node]
        tms = []
        for k, c in enumerate(ch):
            if c is None:
                tms.append(3e38)
                continue
            b = bounds[node, k]
            t0 = (b[0:3] - o) * inv
            t1 = (b[3:6] - o) * inv
            tmin = np.maximum(np.minimum(t0, t1).max(-1), t_min)
            tmax = np.minimum(np.maximum(t0, t1).min(-1), t_best)
            hit = tmax > tmin
            tms.append(np.where(hit, tmin, 3e38).min() if hit.any() else 3e38)
        orderk = np.argsort(tms)
        hits = [k for k in orderk if tms[k] < 3e38]
        for k in reversed(hits):
            stack.append(ch[k])
    return vi, vl, t_best


def prime(brute_tri, o, d, t_min=1e-3):
    t_best = np.full(o.shape[0], 3e38, np.float32)
    for k in range(brute_tri.shape[0]):
        v0, e1, e2 = brute_tri[k, 0:3], brute_tri[k, 3:6], brute_tri[k, 6:9]
        h = np.cross(d, e2)
        a = (e1 * h).sum(-1)
        ok = np.abs(a) >= 1e-8
        f = 1.0 / np.where(ok, a, 1.0)
        s = o - v0
        u = f * (s * h).sum(-1)
        ok &= (u >= 0) & (u <= 1)
        q = np.cross(s, e1)
        v = f * (d * q).sum(-1)
        ok &= (v >= 0) & (u + v <= 1)
        t = f * (e2 * q).sum(-1)
        ok &= (t >= t_min) & (t < t_best)
        t_best = np.where(ok, t, t_best)
    return t_best


def main():
    from raytracer_tpu.camera import make_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scene.builder import reference_scene
    from raytracer_tpu.ops.bvh import build_lbvh
    from raytracer_tpu.utils import rng as rngu
    import jax.numpy as jnp

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    brute_tri = np.asarray(scene.bvh4.brute_tri)

    # Rebuild the binary LBVH over the DENSE (non-brute) faces so every
    # collapse shares identical leaf contents.
    from raytracer_tpu.scene.builder import partition_brute_faces
    mesh = scene.mesh
    _, keep = partition_brute_faces(mesh)
    import dataclasses
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

    # Rays: interior camera band -> bounce-1 diffuse (tiled lane order).
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
    import jax.numpy as jnp2
    ids = intersect_scene(scene, jnp2.asarray(o), jnp2.asarray(d), 1e-3)
    at = shade_hit(scene, jnp2.asarray(o), jnp2.asarray(d), ids)
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
    bo, bd = bo[:m], bd[:m]

    ray_sets = {
        "camera": (o[:8192], d[:8192]),
        "bounce1": (bo[:8192], bd[:8192]),
    }

    shapes = [(4, 8), (4, 16), (8, 8), (8, 16), (8, 32), (16, 16)]
    W = 128
    print(f"{'shape':12s} {'rays':8s} {'int/swarp':>10s} {'leafrow/swarp':>14s} "
          f"{'iters/1024':>11s}")
    results = {}
    for K, max_leaf in shapes:
        bounds, children = collapse_k(left, right, count, lo, node_min, node_max,
                                      K, max_leaf)
        for name, (ro, rd) in ray_sets.items():
            tp = prime(brute_tri, ro, rd)
            ti = tl = 0
            nsub = 0
            for i in range(0, ro.shape[0], W):
                vi, vl, _ = packet_visits(bounds, children, tri,
                                          ro[i:i + W], rd[i:i + W], tp[i:i + W])
                ti += vi
                tl += vl
                nsub += 1
            # kernel lockstep: 8 sub-warps advance together; iterations per
            # 1024-ray packet ~= MAX over its 8 sub-warps ~= mean * 1.15
            iters = (ti + tl) / nsub * 8 / 8  # per sub-warp (mean)
            print(f"bvh{K}/leaf{max_leaf:<3d} {name:8s} {ti/nsub:10.1f} "
                  f"{tl/nsub:14.1f} {iters:11.1f}  (nodes={bounds.shape[0]})")
            results[(K, max_leaf, name)] = iters
    return results


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
