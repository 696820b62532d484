"""Offline study: BVH4 packet-traversal node-visit counts vs packet
width and ray sorting, on the real reference scene (interior camera,
matching the reference screenshot's inside-the-box framing).

Informs the Pallas kernel design: the kernel's cost is ~per-visit
overhead x node visits, so visits/ray at width W (vs 1024) bounds the
speedup of splitting the (8,128) tile into independent 128-lane
sub-warps, and of sorting bounce rays for coherence. The random-ray
case calibrates ns/visit against scripts/tpu_perf.py --trav.

Run on CPU: JAX only for scene build; traversal sim is pure NumPy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def packet_visits(bounds, children, tri, o, d, t_min=1e-3):
    """Exact sim of the kernel: ordered any-hit descent, per-ray t_best
    from leaf Moller-Trumbore. Returns (internal visits, leaf visits,
    t_best) for ONE packet of rays o,d [n,3]."""
    n = o.shape[0]
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    t_best = np.full(n, 3e38, np.float32)
    vi = vl = 0
    stack = [0]
    while stack:
        node = stack.pop()
        if node <= -2:  # leaf
            vl += 1
            code = -node - 2
            lo, cnt = code // 8, code % 8 + 1
            for k in range(cnt):
                v0, e1, e2 = tri[lo + k, 0:3], tri[lo + k, 3:6], tri[lo + k, 6:9]
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
        ch = children[node]
        tms = []
        for k in range(4):
            if ch[k] == -1:
                tms.append(3e38)
                continue
            b = bounds[node, k]
            t0 = (b[0:3] - o) * inv
            t1 = (b[3:6] - o) * inv
            tmin = np.maximum(np.minimum(t0, t1).max(-1), t_min)
            tmax = np.minimum(np.maximum(t0, t1).min(-1), t_best)
            hit = tmax > tmin
            tms.append(np.where(hit, tmin, 3e38).min() if hit.any() else 3e38)
        order = np.argsort(tms)
        hits = [k for k in order if tms[k] < 3e38]
        for k in reversed(hits):
            stack.append(int(ch[k]))
    return vi, vl, t_best


def study(name, o, d, bounds, children, tri, widths=(1024, 256, 128)):
    n = o.shape[0]
    out = {}
    print(f"-- {name}: {n} rays")
    for w in widths:
        ti = tl = 0
        for i in range(0, n, w):
            vi, vl, _ = packet_visits(bounds, children, tri, o[i:i + w], d[i:i + w])
            ti += vi
            tl += vl
        groups = max(1, 1024 // w)
        iters_per_1024 = (ti + tl) / groups / (n / 1024)
        print(f"   width {w:5d}: visits/ray int {ti/n:6.2f} leaf {tl/n:6.2f}  "
              f"lockstep-iters/1024-rays {iters_per_1024:8.1f}")
        out[w] = (ti + tl) / n
    return out


def main():
    from raytracer_tpu.camera import make_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scene.builder import reference_scene
    from raytracer_tpu.utils import rng as rngu
    import jax.numpy as jnp

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    bounds = np.asarray(scene.bvh4.bounds)
    children = np.asarray(scene.bvh4.children)
    tri = np.asarray(scene.bvh4.tri)

    # Calibration set: same distribution as scripts/tpu_perf.py --trav.
    rng = np.random.default_rng(0)
    n = 8192
    o = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = (dd / np.linalg.norm(dd, axis=1, keepdims=True)).astype(np.float32)
    study("random interior (tpu_perf --trav distribution)", o, d, bounds, children, tri,
          widths=(1024,))

    # Interior camera (reference-screenshot framing: inside the box).
    cfg = RenderConfig(width=2560, height=1440, spp=1, max_bounces=20)
    cam = make_camera(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                      aperture=cfg.aperture, position=(0.0, 0.1, 0.28), pitch=-8.0)
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    px, py, _ = _tiled_pixel_grid(cfg)
    lanes_per_tile_row = (2560 // 128) * 1024
    lo = (704 // 8) * lanes_per_tile_row
    sel = slice(lo, lo + 16384)
    px_b, py_b = px[sel], py[sel]
    keys = rngu.lane_keys(jax.random.key(0), py_b * cfg.width + px_b)
    o, d = generate_rays(cam, px_b, py_b, cfg.width, cfg.height, keys)
    o = np.asarray(o)
    d = np.asarray(d)
    study("interior camera middle band (tiled order)", o, d, bounds, children, tri)

    # Diffuse bounce rays from those camera hits.
    from raytracer_tpu.ops.intersect import intersect_scene, shade_hit
    ids = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d), 1e-3)
    at = shade_hit(scene, jnp.asarray(o), jnp.asarray(d), ids)
    hit = np.asarray(ids.hit)
    print(f"camera hit rate: {hit.mean():.2f}")
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
    study("bounce-1 diffuse (lane order)", bo, bd, bounds, children, tri)

    # Same bounce rays, sorted by (direction octant, origin morton).
    oct_ = (bd[:, 0] > 0) * 4 + (bd[:, 1] > 0) * 2 + (bd[:, 2] > 0)
    lo_s = bo.min(0)
    hi_s = bo.max(0)
    cell = ((bo - lo_s) / np.maximum(hi_s - lo_s, 1e-9) * 15.999).astype(np.int32)
    morton = np.zeros(m, np.int64)
    for b in range(4):
        for ax in range(3):
            morton |= ((cell[:, ax].astype(np.int64) >> b) & 1) << (3 * b + ax)
    key = oct_.astype(np.int64) << 12 | morton
    perm = np.argsort(key, kind="stable")
    study("bounce-1 diffuse (octant+morton sorted)", bo[perm], bd[perm], bounds, children, tri)


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
