"""Offline study: DUAL-UNIT iteration counts — each kernel iteration
processes ONE internal-node expansion (from the chain's stack) AND ONE
leaf-row Moller-Trumbore sweep (from a separate per-chain leaf queue),
in parallel, instead of one task of either kind.

Today a leaf visit burns a whole iteration whose internal-expansion
phase is garbage (and vice versa); iterations = vi + vl. With split
queues, iterations ~= max(vi, vl) + skew (leaf rows are discovered by
internal expansions, so the leaf unit can starve early and back up
late). This sim measures the exact count per sub-warp, plus the
near-first ordering degradation from deferring leaf sweeps (t_best
tightens later -> possibly more node visits).

Usage: cd scripts && python dual_unit_study.py
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


def dual_visits(bounds, children, tri, o, d, t_prime, t_min=1e-3):
    """Lockstep dual-unit sim for one sub-warp. Returns (iterations,
    internal visits, leaf-row visits, t_best)."""
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
        # Leaf unit: sweep one pending leaf row.
        if leafq:
            lo_, cnt = leafq.popleft()
            mt_row(lo_, min(cnt, 8))
            if cnt > 8:
                leafq.appendleft((lo_ + 8, cnt - 8))
            vl += 1
        # Internal unit: expand one node.
        if stack:
            kind = stack.pop()
            if kind[0] == "leaf":
                # leaf code popped from the group stack: enqueue its rows
                leafq.append((kind[1], kind[2]))
                # NOTE: costs an internal-unit slot this iteration — model
                # the kernel's "popped a leaf task" as a free forward to
                # the queue (no expansion done). To be conservative count
                # it as consuming the internal unit.
                vi += 0
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
                orderk = np.argsort(tms)
                hits = [k for k in orderk if tms[k] < 3e38]
                for k in reversed(hits):
                    c = ch[k]
                    if c[0] == "leaf":
                        # hit leaf child goes straight to the leaf queue
                        leafq.append((c[1], c[2]))
                    else:
                        stack.append(c)
    return iters, vi, vl, t_best


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()
    bo, bd = bo[:8192], bd[:8192]
    W = 128
    for K, max_leaf in [(4, 8), (8, 8), (8, 16)]:
        bounds, children = collapse_k(left, right, count, lo, node_min, node_max,
                                      K, max_leaf)
        tp = prime(brute_tri, bo, bd)
        ti = tvi = tvl = 0
        nsub = 0
        for i in range(0, bo.shape[0], W):
            it, vi, vl, _ = dual_visits(bounds, children, tri,
                                        bo[i:i + W], bd[i:i + W], tp[i:i + W])
            ti += it
            tvi += vi
            tvl += vl
            nsub += 1
        print(f"bvh{K}/leaf{max_leaf:<3d} dual-unit: iters/swarp {ti/nsub:6.1f} "
              f"(int {tvi/nsub:5.1f}, leafrow {tvl/nsub:5.1f})", flush=True)


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
