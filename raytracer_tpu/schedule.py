"""Pixel-lane layouts for the fused megakernel, plus the (retired)
profile-guided scheduler.

STATUS (round 5): `blocked_pixel_grid` is PRODUCTION — the 32×32-block
packet footprint layout the fused path renders with (+4%,
TILE_SHAPE_STUDY.json). The profile-guided reordering below it
(`order_by_cost` / `order_by_row_cost` / `build_schedule`) is a
RECORDED DEAD END (≤2% recovered — SCHEDULE_STUDY.json: the lockstep
max is per-call transient randomness from bounce-direction draws, not
a static pixel property) and is NOT wired into any production path; it
is kept because it is the vehicle for the any-permutation-is-bit-
identical invariant test (tests/test_schedule.py) and for
scripts/schedule_study.py's negative result.

WHY scheduling looked promising: a fused-kernel packet locksteps its 8 sub-warp chains through the
traversal loop (cost = MAX over chains) and its 1024 lanes through the
path loop (cost = iterations until the LAST lane finishes its samples).
Measured on bvh8 bounce rays, the packet max is 65.9 lockstep
iterations vs a 35.7 sub-warp mean (scripts/order_study.py) — ~1.8x of
pure tail imbalance. Striding rays WITHIN a packet is a wash (the max
is set by packet content, scripts/subwarp_shuffle_study.py), so the
fix is to change packet CONTENT: group pixels of similar measured cost
into the same sub-warps/packets, so every lockstep pays roughly its
own cost instead of the regional maximum.

HOW: one instrumented render (render_tiles_fused(profile=True))
returns a per-lane cost — the lane's chain's traversal iterations
summed over the whole path loop plus its active path iterations. Pixels
are then ordered by (cost-quantile bucket, Morton code): the bucket
equalizes cost within a packet, the Morton order keeps each 128-lane
sub-warp spatially LOCAL within its bucket (sub-warp traversal cost is
the union of its rays' node visits — scattering rays across the screen
would blow the union back up; CLAUDE.md round-2 notes).

The schedule is a pure permutation of pixel ids: RNG is
(pixel, sample, bounce)-keyed (utils/ktf.py), every lane computes only
its own pixel's samples, and closest-hit traversal is order-invariant —
so the scheduled render is BIT-IDENTICAL per pixel to the tile-ordered
render (tests/test_schedule.py). Profiling is scene+camera preprocessing
(like the BVH build): stale schedules degrade throughput, never
correctness.

No reference analog: the reference's 16x16 CUDA blocks rely on the
hardware scheduler for load balance (CUDAHelpers.h:28-35); a TPU packet
has no such scheduler, so balance must be baked into the launch layout.
"""

from __future__ import annotations

import numpy as np

PACKET = 1024
LANE_ROW = 128


def _morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave 16-bit x (low) and y bits → 32-bit Morton code."""
    def part(v):
        v = v.astype(np.int64)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return part(x) | (part(y) << 1)


def order_by_cost(px, py, cost, cfg, n_buckets: int = 32):
    """Reorder lanes by (cost bucket, Morton): px/py/cost are the current
    lane arrays (length N, N % 1024 == 0). Returns (px2, py2, inv) where
    image.flat[p] = render_lanes[inv[p]] (first lane wins on padding
    duplicates, like models/wavefront._tiled_pixel_grid)."""
    import jax.numpy as jnp

    px = np.asarray(px)
    py = np.asarray(py)
    cost = np.asarray(cost, np.float64)
    n = px.shape[0]
    if n_buckets > 1:
        qs = np.quantile(cost, np.linspace(0, 1, n_buckets + 1)[1:-1])
        bucket = np.searchsorted(qs, cost)
    else:
        bucket = np.zeros(n, np.int64)
    mort = _morton2(px, (cfg.height - 1 - py))  # top-down y for locality
    order = np.lexsort((mort, bucket))
    px2 = px[order]
    py2 = py[order]
    w, h = cfg.width, cfg.height
    flat = (h - 1 - py2) * w + px2
    inv = np.zeros(h * w, np.int64)
    inv[flat[::-1]] = np.arange(n, dtype=np.int64)[::-1]
    return jnp.asarray(px2.astype(np.int32)), jnp.asarray(py2.astype(np.int32)), jnp.asarray(inv)


def order_by_row_cost(px, py, cost):
    """Regroup WHOLE 128-lane sub-warp rows by their cost: rows keep
    their (coherent screen-segment) content; only which 8 rows share a
    packet changes. Isolates the lockstep-balancing effect from content
    reshaping. Returns (px2, py2, perm_rows) — callers needing an image
    mapping should use order_by_cost instead."""
    import jax.numpy as jnp

    px = np.asarray(px)
    py = np.asarray(py)
    n = px.shape[0]
    rows = n // LANE_ROW
    row_cost = np.asarray(cost, np.float64).reshape(rows, LANE_ROW).mean(axis=1)
    order = np.argsort(row_cost, kind="stable")
    lane_order = (order[:, None] * LANE_ROW
                  + np.arange(LANE_ROW)[None, :]).reshape(-1)
    return (jnp.asarray(px[lane_order]), jnp.asarray(py[lane_order]),
            order)


def blocked_pixel_grid(cfg, pkt_w: int, pkt_h: int, sub_w: int, sub_h: int):
    """Pixel ids where each 1024-lane packet covers a pkt_w × pkt_h
    screen block and each 128-lane sub-warp a sub_w × sub_h sub-block.

    WHY: a sub-warp chain's traversal cost is the UNION of its 128 rays'
    node visits; for bounce rays (random directions from origins inside
    the footprint) that union grows with the footprint's spatial extent.
    The historical layout (_tiled_pixel_grid) gives each sub-warp a
    1×128 pixel STRIP (diameter 128); a 16×8 block has diameter ~18 at
    the same lane count. Pure relabeling of lanes — same compiled
    kernel, per-pixel bit-identical output (pixel-keyed RNG).

    Returns (px, py [bottom-up], inv) like _tiled_pixel_grid; image
    edges pad with duplicated pixels, dropped by inv (first lane wins).
    """
    import jax.numpy as jnp

    assert pkt_w * pkt_h == PACKET and sub_w * sub_h == LANE_ROW
    assert pkt_w % sub_w == 0 and pkt_h % sub_h == 0
    w, h = cfg.width, cfg.height
    wp = (w + pkt_w - 1) // pkt_w * pkt_w
    hp = (h + pkt_h - 1) // pkt_h * pkt_h
    rows = np.minimum(np.arange(hp), h - 1)
    cols = np.minimum(np.arange(wp), w - 1)
    r2 = np.broadcast_to(rows[:, None], (hp, wp))
    c2 = np.broadcast_to(cols[None, :], (hp, wp))

    def lanes(a):
        a4 = a.reshape(hp // pkt_h, pkt_h, wp // pkt_w, pkt_w)
        a4 = a4.transpose(0, 2, 1, 3)  # [PBy, PBx, pkt_h, pkt_w]
        a6 = a4.reshape(hp // pkt_h, wp // pkt_w,
                        pkt_h // sub_h, sub_h, pkt_w // sub_w, sub_w)
        return a6.transpose(0, 1, 2, 4, 3, 5).reshape(-1)

    lane_rows = lanes(r2)
    lane_cols = lanes(c2)
    n = lane_rows.size
    flat = lane_rows * w + lane_cols
    inv = np.zeros(h * w, np.int64)
    inv[flat[::-1]] = np.arange(n, dtype=np.int64)[::-1]
    px = jnp.asarray(lane_cols.astype(np.int32))
    py = jnp.asarray((h - 1 - lane_rows).astype(np.int32))
    return px, py, jnp.asarray(inv)


def build_schedule(scene, cam, cfg, key, profile_spp: int = 2,
                   n_buckets: int = 32, interpret=None):
    """One instrumented render → (px, py, inv) pixel order for
    render_tiles_fused. Schedule quality depends only on the RELATIVE
    cost ranking, so a low-spp profile suffices."""
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    px, py, _ = _tiled_pixel_grid(cfg)
    _, cost, _ = render_tiles_fused(scene, cam, cfg, key, px, py,
                                    spp=profile_spp, interpret=interpret,
                                    profile=True)
    return order_by_cost(px, py, np.asarray(cost), cfg, n_buckets=n_buckets)
