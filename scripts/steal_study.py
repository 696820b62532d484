"""Offline study: WORK-STEALING across a packet's 8 sub-warp chains —
sizing the 1.84x per-call max-vs-mean lockstep imbalance prize
(KERNEL_STATS_r04) before building the kernel machinery.

Model (faithful to the implementable kernel design):
  * 8 chains traverse their own 128 bounce rays with the production
    dual-unit discipline (one internal expansion + one leaf-row MT per
    lockstep iteration, near-first order) — the no-steal lockstep is
    max over chains, reproducing order_study numbers.
  * When a chain finishes and some chain's internal stack holds >= 2
    entries, the idle chain STEALS the BOTTOM entry (largest pending
    subtree) of the deepest stack and traverses it against the DONOR's
    rays, starting from a COPY of the donor's t_best at steal time.
    Copies evolve independently (helper discoveries do not tighten the
    donor and vice versa — exactly the kernel's per-row t_best planes,
    merged once at the end), so STALENESS COSTS EXTRA VISITS, which
    this sim pays honestly.
  * Each steal costs the helper STEAL_LAT lockstep iterations (the ray
    row copy + bookkeeping).

Prints per-packet lockstep iterations: baseline max, chain mean (the
unreachable ideal), and stolen variants. CPU-only.

Usage: python scripts/steal_study.py
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

T_MIN = 1e-3
W = 128  # sub-warp width


class ChainSim:
    """Stepping version of order_study.dual_visits (order='near',
    single leaf row per iteration) over one ray group."""

    def __init__(self, bounds, children, tri, o, d, t_best, stack):
        self.bounds = bounds
        self.children = children
        self.tri = tri
        self.o = o
        self.d = d
        with np.errstate(divide="ignore"):
            self.inv = 1.0 / d
        self.t_best = t_best  # own (possibly copied) array
        self.stack = list(stack)
        self.leafq = deque()
        self.iters = 0

    def done(self):
        return not self.stack and not self.leafq

    def _mt_row(self, lo_, cnt):
        tri, o, d = self.tri, self.o, self.d
        for k in range(min(cnt, 8)):
            v0, e1, e2 = (tri[lo_ + k, 0:3], tri[lo_ + k, 3:6],
                          tri[lo_ + k, 6:9])
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
            ok &= (t >= T_MIN) & (t < self.t_best)
            self.t_best = np.where(ok, t, self.t_best)

    def step(self):
        """One lockstep iteration: one leaf row + one internal expand."""
        self.iters += 1
        if self.leafq:
            lo_, cnt = self.leafq.popleft()
            self._mt_row(lo_, cnt)
            if cnt > 8:
                self.leafq.appendleft((lo_ + 8, cnt - 8))
        if self.stack:
            kind = self.stack.pop()
            if kind[0] == "leaf":
                self.leafq.append((kind[1], kind[2]))
                return
            node = kind[1]
            ch = self.children[node]
            tms = []
            for k, c in enumerate(ch):
                if c is None:
                    tms.append(3e38)
                    continue
                b = self.bounds[node, k]
                t0 = (b[0:3] - self.o) * self.inv
                t1 = (b[3:6] - self.o) * self.inv
                tmin = np.maximum(np.minimum(t0, t1).max(-1), T_MIN)
                tmax = np.minimum(np.maximum(t0, t1).min(-1), self.t_best)
                hit = tmax > tmin
                tms.append(np.where(hit, tmin, 3e38).min()
                           if hit.any() else 3e38)
            orderk = [k for k in np.argsort(tms) if tms[k] < 3e38]
            for k in reversed(orderk):
                c = ch[k]
                if c[0] == "leaf":
                    self.leafq.append((c[1], c[2]))
                else:
                    self.stack.append(c)


def packet_lockstep(bounds, children, tri, o8, d8, tp8, steal=False,
                    steal_lat=1, min_stack=2):
    """o8/d8/tp8: lists of 8 per-chain (W,3)/(W,) arrays. Returns
    (lockstep_iters, per-chain own iters, n_steals)."""
    chains = []
    own_iters = []
    for s in range(8):
        # Root test: does any ray enter the tree?
        b = bounds[0]
        entered = False
        tb = tp8[s].copy()
        with np.errstate(divide="ignore"):
            inv = 1.0 / d8[s]
        for k, c in enumerate(children[0]):
            if c is None:
                continue
            t0 = (bounds[0, k, 0:3] - o8[s]) * inv
            t1 = (bounds[0, k, 3:6] - o8[s]) * inv
            tmin = np.maximum(np.minimum(t0, t1).max(-1), T_MIN)
            tmax = np.minimum(np.maximum(t0, t1).min(-1), tb)
            if (tmax > tmin).any():
                entered = True
                break
        stack = [("int", 0)] if entered else []
        chains.append(ChainSim(bounds, children, tri, o8[s], d8[s], tb,
                               stack))

    # Baseline per-chain iteration counts (no steal) for reporting.
    workers = chains
    lockstep = 0
    n_steals = 0
    pending_lat = [0] * 8  # steal latency countdown per worker slot
    tasks = list(chains)  # worker s runs tasks[s] (own chain or stolen)

    while True:
        busy = [s for s in range(8)
                if pending_lat[s] > 0 or (tasks[s] and not tasks[s].done())]
        if not busy:
            if not steal:
                break
            break
        lockstep += 1
        for s in range(8):
            if pending_lat[s] > 0:
                pending_lat[s] -= 1
                continue
            t = tasks[s]
            if t is not None and not t.done():
                t.step()
                continue
            if not steal:
                continue
            # idle worker: steal bottom entry of the deepest stack
            donor = None
            best_depth = min_stack - 1
            for j in range(8):
                tj = tasks[j]
                if tj is None or tj is t:
                    continue
                depth = len([e for e in tj.stack if e[0] == "int"])
                if depth > best_depth:
                    best_depth = depth
                    donor = tj
            if donor is None:
                continue
            # find bottom internal entry
            for idx in range(len(donor.stack)):
                if donor.stack[idx][0] == "int":
                    entry = donor.stack.pop(idx)
                    break
            helper = ChainSim(bounds, children, tri, donor.o, donor.d,
                              donor.t_best.copy(), [entry])
            tasks[s] = helper
            pending_lat[s] = steal_lat
            n_steals += 1

    own = [c.iters for c in chains]
    return lockstep, own, n_steals


def main():
    (brute_tri, left, right, count, lo, node_min, node_max, tri,
     bo, bd) = setup()
    bo, bd = bo[:16384], bd[:16384]
    tp = prime(brute_tri, bo, bd)
    bounds, children = collapse_k(left, right, count, lo, node_min,
                                  node_max, 8, 8)

    n_pk = bo.shape[0] // (8 * W)
    rows = {"base": [], "mean": [], "steal1": [], "steal3": []}
    steals_total = 0
    for p in range(n_pk):
        o8 = [bo[(p * 8 + s) * W:(p * 8 + s + 1) * W] for s in range(8)]
        d8 = [bd[(p * 8 + s) * W:(p * 8 + s + 1) * W] for s in range(8)]
        tp8 = [tp[(p * 8 + s) * W:(p * 8 + s + 1) * W] for s in range(8)]
        base, own, _ = packet_lockstep(bounds, children, tri, o8, d8, tp8,
                                       steal=False)
        s1, _, ns1 = packet_lockstep(bounds, children, tri, o8, d8, tp8,
                                     steal=True, steal_lat=1)
        s3, _, ns3 = packet_lockstep(bounds, children, tri, o8, d8, tp8,
                                     steal=True, steal_lat=3)
        rows["base"].append(base)
        rows["mean"].append(np.mean(own))
        rows["steal1"].append(s1)
        rows["steal3"].append(s3)
        steals_total += ns1
        print(f"packet {p:2d}: base {base:5.0f}  chain-mean {np.mean(own):6.1f}"
              f"  steal(lat1) {s1:5.0f}  steal(lat3) {s3:5.0f}"
              f"  steals {ns1}", flush=True)

    b = np.mean(rows["base"])
    m = np.mean(rows["mean"])
    s1 = np.mean(rows["steal1"])
    s3 = np.mean(rows["steal3"])
    print(f"\nmean lockstep/packet: base {b:.1f}  ideal(chain-mean) {m:.1f} "
          f"(x{b/m:.2f})  steal-lat1 {s1:.1f} (x{b/s1:.2f})  "
          f"steal-lat3 {s3:.1f} (x{b/s3:.2f})  "
          f"steals/packet {steals_total/n_pk:.1f}")


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter()-t0:.1f}s")
