"""Offline study: dual-unit iteration counts vs CHILD ORDERING POLICY
and tree width — what ordering hardware the BVH8 kernel must pay for.

The v6 kernel runs TWO kind-split sort-K networks per iteration (near-
first internal descend+push and near-first leaf enqueue). For K=8 the
network is 19 compare-exchanges x ~8 vector ops x 2 units — a real per-
iteration cost. This sim measures what each cheaper policy costs in
ITERATIONS (the other factor of the frame-time product):

  near      — full near-first (current kernel policy; sort-K)
  min       — descend the NEAREST internal child (vector argmin, no
              sort); push/enqueue the rest in SLOT order
  slot      — no ordering at all: descend first-hit slot, push rest

Leaf-unit throughput variants: 1 or 2 leaf rows per iteration.

CPU-only. Usage: python scripts/order_study.py
"""

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tree_shape_study import collapse_k, prime
from width_study import setup


def dual_visits(bounds, children, tri, o, d, t_prime, order="near",
                leaf_rows_per_iter=1, t_min=1e-3):
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    t_best = t_prime.copy()
    stack = [("int", 0)]
    leafq = deque()
    iters = vi = vl = 0

    def mt_row(lo_, cnt):
        nonlocal t_best
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

    while stack or leafq:
        iters += 1
        for _ in range(leaf_rows_per_iter):
            if leafq:
                lo_, cnt = leafq.popleft()
                mt_row(lo_, min(cnt, 8))
                if cnt > 8:
                    leafq.appendleft((lo_ + 8, cnt - 8))
                vl += 1
        if stack:
            kind = stack.pop()
            if kind[0] == "leaf":
                leafq.append((kind[1], kind[2]))
            else:
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
                hits_slot = [k for k in range(len(ch)) if tms[k] < 3e38]
                if not hits_slot:
                    continue
                if order == "near":
                    orderk = [k for k in np.argsort(tms) if tms[k] < 3e38]
                elif order == "min":
                    nearest = min(hits_slot, key=lambda k: tms[k])
                    orderk = [nearest] + [k for k in hits_slot if k != nearest]
                else:  # slot
                    orderk = hits_slot
                for k in reversed(orderk):
                    c = ch[k]
                    if c[0] == "leaf":
                        leafq.append((c[1], c[2]))
                    else:
                        stack.append(c)
    return iters, vi, vl


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()
    bo, bd = bo[:8192], bd[:8192]
    W = 128
    tp = prime(brute_tri, bo, bd)
    rows = []
    for K, max_leaf in [(4, 8), (8, 8), (16, 16)]:
        bounds, children = collapse_k(left, right, count, lo, node_min,
                                      node_max, K, max_leaf)
        for order in ("near", "min", "slot"):
            for lpr in (1, 2):
                ti = tvi = tvl = mx = 0
                nsub = 0
                for i in range(0, bo.shape[0], W):
                    it, vi, vl = dual_visits(bounds, children, tri,
                                             bo[i:i + W], bd[i:i + W],
                                             tp[i:i + W], order=order,
                                             leaf_rows_per_iter=lpr)
                    ti += it
                    tvi += vi
                    tvl += vl
                    mx = max(mx, it)
                    nsub += 1
                print(f"bvh{K}/leaf{max_leaf:<3d} {order:5s} leafrows={lpr}: "
                      f"iters/swarp {ti/nsub:6.1f} (int {tvi/nsub:5.1f}, "
                      f"leafrow {tvl/nsub:5.1f}, max {mx})", flush=True)


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
