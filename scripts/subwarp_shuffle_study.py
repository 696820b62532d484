"""Offline study: does STRIDING pixels across a packet's 8 sub-warps
balance their traversal depth (packet lockstep = max over sub-warps)?

Today sub-warp s of a packet is screen-tile ROW s — 128 spatially
adjacent pixels. Adjacent rows have correlated content (a row crossing
the bunny is deep, the row above may be wall-only), so the packet's
max-of-8 runs ~1.8x its mean (order_study). Striding lanes (sub-warp s
= lanes s, s+8, s+16, ... of the tile) gives every sub-warp the same
content mix. Cost: none in the kernel (it's a host-side lane
permutation; pixel-keyed RNG keeps images bit-identical). Risk: camera
rays per sub-warp lose adjacency — their union footprint may grow.

Prints packet-max iteration stats for both layouts on camera and
bounce rays. CPU-only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from order_study import dual_visits  # noqa: E402
from tree_shape_study import collapse_k, prime  # noqa: E402
from width_study import setup  # noqa: E402


def packet_stats(bounds, children, tri, o, d, tp, layout):
    iters = []
    n = o.shape[0]
    for p0 in range(0, n, 1024):
        o_t = o[p0:p0 + 1024]
        d_t = d[p0:p0 + 1024]
        t_t = tp[p0:p0 + 1024]
        worst = 0
        for s in range(8):
            sel = (slice(s * 128, (s + 1) * 128) if layout == "rows"
                   else slice(s, None, 8))
            it, _, _ = dual_visits(bounds, children, tri, o_t[sel], d_t[sel],
                                   t_t[sel], order="near",
                                   leaf_rows_per_iter=1)
            worst = max(worst, it)
        iters.append(worst)
    a = np.array(iters)
    return a.mean(), np.percentile(a, 90)


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()
    bo, bd = bo[:8192], bd[:8192]
    tp = prime(brute_tri, bo, bd)
    bounds, children = collapse_k(left, right, count, lo, node_min,
                                  node_max, 8, 8)
    for layout in ("rows", "strided"):
        m, p90 = packet_stats(bounds, children, tri, bo, bd, tp, layout)
        print(f"bounce {layout:8s}: packet-max mean {m:6.1f}  p90 {p90:5.0f}",
              flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
