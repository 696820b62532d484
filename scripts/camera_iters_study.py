"""Offline: lockstep iteration counts for CAMERA packets (the showcase
top-of-image tiles timed by kernel_stats.py), v5 single-task sim
(iterations = int visits + leaf visits) vs v6 dual-unit sim — to
attribute the measured mb1 regression (0.611 s v5 → 1.033 s v6/bvh4)
to iteration counts vs per-iteration cost.

cd scripts && python camera_iters_study.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tree_shape_study import collapse_k, packet_visits, prime
from dual_unit_study import dual_visits
from width_study import setup


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()

    # Camera rays: same as kernel_stats.py — first 128 packets of the
    # 2K tiled lane order (top tile rows of the showcase framing).
    from raytracer_tpu.camera import showcase_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.utils import rng as rngu
    import jax as jx

    cfg = RenderConfig(width=2560, height=1440, spp=2, max_bounces=20)
    cam = showcase_camera(cfg)
    px, py, _ = _tiled_pixel_grid(cfg)
    n = 16 * 1024  # 16 packets is enough for a mean
    keys = rngu.lane_keys(jx.random.key(0), py[:n] * cfg.width + px[:n])
    o, d = generate_rays(cam, px[:n], py[:n], cfg.width, cfg.height, keys)
    o = np.asarray(o)
    d = np.asarray(d)

    bounds, children = collapse_k(left, right, count, lo, node_min, node_max,
                                  4, 8)
    tp = prime(brute_tri, o, d)
    W = 128
    t5i = t5l = t6 = 0
    nsub = 0
    for i in range(0, n, W):
        vi, vl, _ = packet_visits(bounds, children, tri,
                                  o[i:i + W], d[i:i + W], tp[i:i + W])
        it6, _, _, _ = dual_visits(bounds, children, tri,
                                   o[i:i + W], d[i:i + W], tp[i:i + W])
        t5i += vi
        t5l += vl
        t6 += it6
        nsub += 1
    print(f"camera sub-warps: v5 iters {( t5i+t5l)/nsub:6.1f} "
          f"(int {t5i/nsub:.1f} leaf {t5l/nsub:.1f})   "
          f"v6 dual iters {t6/nsub:6.1f}")


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
