"""Pallas packet-traversal kernel — the speed-of-light tracing core.

Why this exists: on TPU, XLA lowers every gather (and any other
non-fusible op) to a separate kernel thunk with a large fixed launch
cost; a BVH traversal loop issues several per step, which measured
~0.6-0.75 ms *per traversal step* regardless of batch size. This kernel
collapses the entire wavefront-vs-BVH query into ONE launch.

Mosaic (TPU) constraints that shaped the implementation — each was hit
as a real compile error:
  * no vector int indexing (gathers) in kernels,
  * dynamic loads must be lane-aligned: even a single element is a
    (1,1) vector load whose lane offset must be provably 0 (mod 128),
  * VMEM arrays pad their trailing dim to 128 lanes — a [T,9] table
    physically occupies [T,128] (40 MB for 82k tris),
  * grid pipelining allocates per-step staging of whole-array inputs.

Hence the layout (v6): BVH4 nodes are ROW-PER-NODE (lanes 0:24 child
bounds, 24:28 child codes float-encoded — NOT bitcast, which
miscompiles in-kernel on the 2026-08-18 backend, see _pack_tables_v6;
the task id IS the row id, so the fetch has no index math or select
chain), and triangles EIGHT per row (16 lanes each: v0,e1,e2, prim id,
material id) with every LEAF 8-aligned to one row
(bvh4.align_leaves_to_rows) — a leaf visit is ONE dynamically-indexed
aligned row load and 8 static record slices. The kernel runs without a
Pallas grid: a fori_loop walks all packets of one launch (grid
pipelining would double-buffer the resident tables). Each (8,128)
packet's sublane rows are 8 INDEPENDENT 128-ray SUB-WARPS with DUAL
WORK UNITS per iteration — one internal-node expansion and one
leaf-row sweep from split per-chain stacks (see _kernel_body) — narrow
sub-warps cut the 'any ray hits → descend' divergence penalty ~4x for
incoherent interior bounce rays while every op still fills full
(8,128) vregs, and the split units cut lockstep iterations a further
~1.4x (scripts/dual_unit_study.py). Per-ray t_best keeps closest-hit
exact (equivalence-tested against brute force).

Two-level split: oversized triangles (Bvh4.brute_tri, selected by
scene/builder.partition_brute_faces) are swept brute-force from STATIC
rows before traversal, priming t_best; with the Cornell shell handled
there, the tree covers only the dense mesh and most bounce packets
fail the root test outright.

Rays arrive in the wavefront's static 8×128 screen-tile lane order;
dynamic (direction octant, origin Morton) sorting exists (sort=True)
but measures slower than its argsort/permute gathers save.

The kernel also returns the winning triangle's material id and
geometric normal so the wavefront's shade stage needs no table lookups
(see ops/intersect.trace_frame_fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.bvh4 import Bvh4

BIG = np.float32(3.0e38)
HALF_BIG = np.float32(1.5e38)  # orders rep-miss (but visited) children last
P_SUB, P_LANE = 8, 128
PACKET = P_SUB * P_LANE  # 1024 rays per packet
NONE = np.int32(-1)
# Pair-packed stack encoding: two 16-bit codes per 32-bit entry
# (node-row and tri-row ids are asserted < 2^16 at pack time).
EMPTY16 = np.int32(0xFFFF)       # "no code" half-sentinel
SPARE_NONE = np.int32(-1)        # both halves empty
SPARE_HIGH = np.int32(-65536)    # 0xFFFF0000: empty high half
STACK_CAP = 256  # SMEM entries (1 KB); build asserts stack_depth <= this
# Skip the leaf-unit block (8 row loads + 8 MT sweeps) on iterations
# where every chain's leaf queue is idle. Output-invariant; A/B toggle.
import os as _os

LEAF_COND = _os.environ.get("RAYTRACER_TPU_LEAF_COND", "1") != "0"
# VECTOR-STACK mode: the per-chain stacks/tasks/spares live in VREG
# loop carries — an (8,128) i32 "pointer stack" per unit (bottom at
# lane 0; pushes write through `lane == position` masks, pops read via
# a masked lane-reduction) — and the whole push/pop/descend decision
# phase runs as (8,1)-column vector ops for all 8 chains at once.
# WHY TRIED: scripts/kernel_ablate_v8.py measures the per-chain SCALAR
# phase at 0.79 us of a 1.85 us serialized iteration (43%) — dominated
# by the ~100 vreg->scalar sublane extracts + SMEM stores; the vector
# form needs only the 16 row-load index extracts. Decision stream is
# IDENTICAL to the SMEM form (same formulas per chain), so traversal
# order and results are bit-exact across the two modes.
# MEASURED (round 5): on-chip 2K spp8/mb20 = 8.91 s vs 8.80 s SMEM —
# PARITY. Conclusion: in the real (while_loop) kernel the scalar phase
# overlaps under the fetch->slab->reduce->decide latency chain, so
# removing its issue slots buys nothing; the ablation harness's
# serialized fori body overstated it. Kept default-OFF as a recorded
# experiment (flip with RAYTRACER_TPU_VSTACK=1; equality-tested).
VSTACK = _os.environ.get("RAYTRACER_TPU_VSTACK", "0") != "0"
# Traversal bodies per while-loop iteration (see loop_body below).
# MEASURED (round 5): UNROLL=2 is -8% on the 2K spp2 frame (2.87 ->
# 2.64 s) but a WASH at the spp8 bench config (8.70-8.82 s both ways;
# UNROLL=3 slower) -- the while-loop machinery is not a significant
# per-iteration cost at production call lengths. Default 1.
UNROLL = int(_os.environ.get("RAYTRACER_TPU_UNROLL", "1"))
# Skip the whole internal-unit side (8 node-row fetches, slabs, rep-key
# reductions, the two sort networks, pair packing) on iterations where
# EVERY chain's internal unit is dead (nt == NONE for all 8 — pure
# leaf-drain tails). Output-invariant: with all nt == NONE the decision
# phase ignores every internal-side input.
# MEASURED (round 5): ~12% SLOWER on the 2K spp8 frame (9.98/10.13 s vs
# 8.86/9.27 s) -- the cond branch + 12 materialized outputs cost more
# than the rare all-8-chains-internal-idle iterations save (unlike
# LEAF_COND, whose skip fires on ~25% of iterations and drops 8 row
# loads + 8 MT sweeps). Default OFF; kept as the A/B record.
INT_COND = _os.environ.get("RAYTRACER_TPU_INT_COND", "0") != "0"

# Retired default-off machinery (round-5 kernel diet; re-derivable from
# git history if a new scene changes the verdict):
#   * PREFETCH (software-pipelined node fetch): measured a no-op — the
#     Mosaic scheduler already hides the row-load latency (ROADMAP r4).
#   * LEAF_ROWS=2 (dual tri-row sweeps): 18% fewer lockstep iterations
#     but measured SLOWER on-chip (2K spp8 10.63 s vs 10.08 s) — the
#     second MT block + row loads outweigh the saved iterations.
# Packets per kernel launch (bounds the launch's ray/output VMEM).
MAX_PACKETS_PER_CALL = 512  # bounds ray/output VMEM alongside the tables
NODE_STRIDE = 32  # lanes per node record (4 per row)
TRI_STRIDE = 16   # lanes per triangle record (8 per row)


def _pack_tables(bvh4: Bvh4, fmat: jnp.ndarray):
    """Host/jit-side packing into the kernel's aligned-row layout."""
    n4 = bvh4.bounds.shape[0]
    t = bvh4.tri.shape[0]

    # Integer fields ride in the float tables as FLOAT-ENCODED VALUES
    # (exact for |v| < 2^24), converted back with astype inside the
    # kernel. NOT bitcast: on the 2026-08-18 backend, in-kernel
    # bitcast_convert_type of record slices from concat-replicated /
    # select-chained rows miscompiles to zeros or faults
    # (scripts/bitcast_probe.py p1/p3/p4) — zeroed child codes then spin
    # the traversal loop forever and crash the device.
    # prim/mat ids < t; leaf codes ≈ 8*t; node tasks < 4*n4.
    assert 8 * t + 16 < (1 << 24) and 4 * n4 < (1 << 24), (
        "float-encoded table ids exceed exact-f32 range")

    # Nodes: [ceil(n4/4), 128] f32; node n at row n//4, lanes 32*(n%4):
    # child-box bounds (24: per child min x,y,z then max x,y,z) +
    # child codes (4, float-encoded i32) + pad (4).
    node_vals = jnp.concatenate(
        [bvh4.bounds.reshape(n4, 24),
         bvh4.children.astype(jnp.float32),
         jnp.zeros((n4, NODE_STRIDE - 28), jnp.float32)], axis=1)  # [n4,32]
    pad_n = (-n4) % 4
    if pad_n:
        node_vals = jnp.concatenate(
            [node_vals, jnp.zeros((pad_n, NODE_STRIDE), jnp.float32)])
    node_pack = node_vals.reshape(-1, 4 * NODE_STRIDE)  # [ceil(n4/4),128]

    # Triangles: [t/8, 128] f32; tri k at row k//8, lanes 16*(k%8):
    # [v0(3) e1(3) e2(3) prim(float-enc) mat(float-enc) pad(5)].
    # Leaf ranges are 8-aligned (bvh4.align_leaves_to_rows), so one leaf
    # == one row and t % 8 == 0; the kernel fetches a leaf with a single
    # aligned row load and static record slices.
    assert t % 8 == 0, "Bvh4 triangle table must be leaf-row aligned"
    def pack_rows(tri9, prim, mat):
        tt = tri9.shape[0]
        vals = jnp.concatenate(
            [tri9,
             prim.astype(jnp.float32)[:, None],
             mat.astype(jnp.float32)[:, None],
             jnp.zeros((tt, TRI_STRIDE - 11), jnp.float32)], axis=1)  # [tt,16]
        return vals.reshape(-1, 8 * TRI_STRIDE)  # [tt/8,128]

    tri_pack = pack_rows(bvh4.tri, bvh4.prim_index, fmat)
    n_leaf_rows = tri_pack.shape[0]
    # Brute-force set (two-level split): packed as extra rows AFTER the
    # leaf rows; the kernel sweeps them statically before traversal.
    if bvh4.brute_tri is not None:
        assert bvh4.brute_tri.shape[0] % 8 == 0
        tri_pack = jnp.concatenate(
            [tri_pack, pack_rows(bvh4.brute_tri, bvh4.brute_prim, bvh4.brute_mat)])
    n_brute_rows = tri_pack.shape[0] - n_leaf_rows
    # Trailing all-zero row: sub-warps not at a leaf read it and their
    # degenerate records self-reject in Möller–Trumbore.
    tri_pack = jnp.concatenate(
        [tri_pack, jnp.zeros((1, 8 * TRI_STRIDE), jnp.float32)])
    return node_pack, tri_pack, n_leaf_rows, n_brute_rows


def _select_record(row, sub, n_options, stride):
    """row: (1,128); sub: scalar in [0,n_options) → (1,stride) via a
    static-slice select chain (dynamic lane offsets are not allowed).
    Used by the v5-layout probe scripts (scripts/kernel_*_probe.py);
    the production v6 kernel is row-per-node and needs no select."""
    rec = row[:, 0:stride]
    for q in range(1, n_options):
        rec = jnp.where(sub == q, row[:, q * stride:(q + 1) * stride], rec)
    return rec


def _pack_tables_v6(bvh4: Bvh4, fmat: jnp.ndarray):
    """v6 layout: ROW-PER-NODE node table + the v5 triangle table.

    Node row n (f32[128]): lanes 0:24 = per-child (min xyz, max xyz),
    24:28 = float-encoded child codes, rest zero. Child codes: internal
    → CHILD NODE ROW id (the task IS the row — no //4 %4 fetch math or
    select chain); leaf → -(2 + tri_row) (leaves are exactly one tri
    row after bvh4.align_leaves_to_rows, so the count nibble of the
    Bvh4 encoding is dropped); empty → -1. Costs 512 B/node of VMEM
    (~3.7 MB for the bunny tree) — affordable; saves ~20 ns of scalar
    fetch math per chain-visit.

    Returns (node_pack [n4,128], tri_pack [rows,128], n_leaf_rows,
    n_brute_rows); tri_pack layout (8 records × 16 lanes, brute rows
    appended, trailing zero row) is identical to _pack_tables."""
    n4 = bvh4.bounds.shape[0]
    t = bvh4.tri.shape[0]
    K = bvh4.children.shape[1]  # node width (4 or widened 8)
    assert 8 * t + 16 < (1 << 24) and n4 < (1 << 24), (
        "float-encoded table ids exceed exact-f32 range")
    assert t % 8 == 0, "Bvh4 triangle table must be leaf-row aligned"
    assert 7 * K <= 128, "node record must fit one 128-lane row"
    # Pair-packed stacks hold two 16-bit ids per entry.
    assert n4 < 0xFFFF and t // 8 < 0xFFFF, (
        "node/tri-row ids exceed the pair-packed 16-bit stack encoding")

    ch = bvh4.children
    ch = jnp.where(ch <= -2, -(2 + (-ch - 2) // 64), ch)  # leaf → tri row
    node_pack = jnp.concatenate(
        [bvh4.bounds.reshape(n4, 6 * K),
         ch.astype(jnp.float32),
         jnp.zeros((n4, 128 - 7 * K), jnp.float32)], axis=1)  # [n4,128]

    def pack_rows(tri9, prim, mat):
        tt = tri9.shape[0]
        vals = jnp.concatenate(
            [tri9,
             prim.astype(jnp.float32)[:, None],
             mat.astype(jnp.float32)[:, None],
             jnp.zeros((tt, TRI_STRIDE - 11), jnp.float32)], axis=1)
        return vals.reshape(-1, 8 * TRI_STRIDE)

    tri_pack = pack_rows(bvh4.tri, bvh4.prim_index, fmat)
    n_leaf_rows = tri_pack.shape[0]
    if bvh4.brute_tri is not None:
        assert bvh4.brute_tri.shape[0] % 8 == 0
        tri_pack = jnp.concatenate(
            [tri_pack, pack_rows(bvh4.brute_tri, bvh4.brute_prim, bvh4.brute_mat)])
    n_brute_rows = tri_pack.shape[0] - n_leaf_rows
    tri_pack = jnp.concatenate(
        [tri_pack, jnp.zeros((1, 8 * TRI_STRIDE), jnp.float32)])
    return node_pack, tri_pack, n_leaf_rows, n_brute_rows


def hoist_invariants(node_ref, tri_ref, brute_rows, K):
    """PACKET-INVARIANT hoists, computed once per launch instead of once
    per packet (the sublane-replicating concatenates and the root-box
    reduction cost ~15 us/packet when traced inside the packet loop —
    scripts/packet_cost_probe.py): the brute-row replicas and the
    root-box (8,1) columns. Shared with ops/pallas_megakernel.py."""
    brute_trows = [
        jnp.concatenate([tri_ref[r:r + 1]] * P_SUB, axis=0)
        for r in brute_rows]
    row0 = jnp.concatenate([node_ref[0:1]] * P_SUB, axis=0)
    neg = jnp.float32(-BIG)

    def rcol(k, j):
        c = k * 6 + j
        return row0[:, c:c + 1]                      # (8,1)

    root_lo = [rcol(0, j) for j in range(3)]
    root_hi = [jnp.full((P_SUB, 1), neg) for _ in range(3)]
    for k in range(K):
        fin = rcol(k, 3) > neg
        for j in range(3):
            if k > 0:
                root_lo[j] = jnp.minimum(root_lo[j], rcol(k, j))
            root_hi[j] = jnp.maximum(
                root_hi[j], jnp.where(fin, rcol(k, 3 + j), neg))
    return brute_trows, root_lo, root_hi


def _make_kernel(t_min: float, n_packets: int, stack_cap: int, zero_row: int,
                 brute_rows: tuple, max_iters: int, n_children: int = 4):
    def kernel(node_ref, tri_ref, o_ref, d_ref, tlim_ref,
               t_out_ref, id_out_ref, mat_out_ref,
               nx_out_ref, ny_out_ref, nz_out_ref):
        def body_scoped(ntask_ref, sp_ref, ltask_ref, lsp_ref,
                        stack_ref, lstack_ref, ispare_ref, lspare_ref):
            K = n_children
            brute_trows, root_lo, root_hi = hoist_invariants(
                node_ref, tri_ref, brute_rows, K)

            def per_packet(p, _):
                _kernel_body(t_min, stack_cap, zero_row, max_iters,
                             n_children, brute_trows, root_lo, root_hi, p,
                             node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                             t_out_ref, id_out_ref, mat_out_ref,
                             nx_out_ref, ny_out_ref, nz_out_ref,
                             ntask_ref, sp_ref, ltask_ref, lsp_ref,
                             stack_ref, lstack_ref, ispare_ref,
                             lspare_ref)
                return 0

            jax.lax.fori_loop(0, n_packets, per_packet, 0)

        pl.run_scoped(body_scoped,
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB * stack_cap,), jnp.int32),
                      pltpu.SMEM((P_SUB * stack_cap,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32))

    return kernel


def traverse_tile(t_min, stack_cap, zero_row, max_iters, n_children,
                  brute_trows, root_lo, root_hi,
                  node_ref, tri_ref,
                  ox, oy, oz, dx, dy, dz, t_lim,
                  ntask_ref, sp_ref, ltask_ref, lsp_ref,
                  stack_ref, lstack_ref, ispare_ref, lspare_ref,
                  profile: bool = False):
    """Full scene trace of ONE (8,128) ray tile: brute pre-pass + v6
    dual-unit sub-warp BVH traversal (see _kernel_body docstring for the
    design). Inputs ox..dz/t_lim are (8,128) tiles already in vregs;
    returns (t_best, best_prim, mat_id, nx, ny, nz) tiles. Shared by the
    per-bounce traversal kernel (_make_kernel) and the fused
    path-loop megakernel (ops/pallas_megakernel.py).

    `profile=True` (static) appends two returns: (7th) an (8,128) f32
    tile where every lane of sub-warp s holds the number of traversal
    iterations chain s stayed alive — the packet pays max over chains
    per iteration (lockstep), so this is the per-row contribution to the
    packet's traversal bill; (8th) the scalar number of LOCKSTEP
    iterations this call executed. Feeds the scheduler
    (raytracer_tpu/schedule.py) and the cost-decomposition ledger
    (scripts/kernel_stats.py)."""
    ix = 1.0 / dx
    iy = 1.0 / dy
    iz = 1.0 / dz

    t_best0 = t_lim
    best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
    mat0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
    n0 = jnp.zeros((P_SUB, P_LANE), jnp.float32)

    def slab(lx, ly, lz, hx, hy, hz, t_best):
        """Bounds are scalars or (8,1) per-sub-warp columns; rays are
        (8,128) planes. Returns hit mask and entry t, both (8,128)."""
        t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
        t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
        t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        return tmax > tmin, tmin

    def mt_record(fields, prim, matid, state):
        """Möller–Trumbore one triangle record against the whole tile.
        `fields` = 9 values (v0,e1,e2 components), each a scalar or an
        (8,1) per-sub-warp column; prim/matid likewise (i32). Degenerate
        (all-zero) records self-reject at the determinant epsilon.
        Returns the updated (t_best, best, mat, nx, ny, nz) state."""
        t_best, best, mat, nx, ny, nz = state
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = fields
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(a) >= 1e-8
        f = 1.0 / jnp.where(ok, a, 1.0)
        sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        ok &= (u >= 0.0) & (u <= 1.0)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok &= (t >= t_min) & (t < t_best)
        t_best = jnp.where(ok, t, t_best)
        best = jnp.where(ok, prim, best)
        mat = jnp.where(ok, matid, mat)
        # Geometric (unnormalized) face normal of the winning triangle —
        # normalized outside (reference Core/Mesh.cuh:303).
        nx = jnp.where(ok, e1y * e2z - e1z * e2y, nx)
        ny = jnp.where(ok, e1z * e2x - e1x * e2z, ny)
        nz = jnp.where(ok, e1x * e2y - e1y * e2x, nz)
        return t_best, best, mat, nx, ny, nz

    # Brute-force pre-pass (two-level split): sweep the large triangles
    # from the packet-invariant replicated rows (hoisted by the caller),
    # priming t_best — after the split the root box only covers the
    # dense mesh, so most packets never enter the tree.
    state0 = (t_best0, best0, mat0, n0, n0, n0)
    for trow in brute_trows:
        for k in range(8):
            trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]  # (8,16)
            ids = trec[:, 9:11].astype(jnp.int32)  # float-encoded (no bitcast)
            state0 = mt_record(tuple(trec[:, c:c + 1] for c in range(9)),
                               ids[:, 0:1], ids[:, 1:2], state0)
    t_best0, best0, mat0, n0x, n0y, n0z = state0
    K = n_children
    # Root test from the hoisted (8,1) root-box columns. The original
    # scalar form extracted ~6*K individual non-zero lanes from the
    # root row; such extracts are the SLOW Mosaic operation, and that
    # block alone made every packet cost ~40 us before its traversal
    # loop even started (scripts/packet_cost_probe.py 'dead' packets).
    rhit, _ = slab(root_lo[0], root_lo[1], root_lo[2],
                   root_hi[0], root_hi[1], root_hi[2], t_best0)
    alive_cnt = jnp.sum(rhit.astype(jnp.int32), axis=1, keepdims=True)  # (8,1)

    if VSTACK:
        zero_col_i = jnp.zeros((P_SUB, 1), jnp.int32)
        ntask0 = jnp.where(alive_cnt > 0, jnp.int32(0), NONE)    # (8,1)
        ltask0 = jnp.full((P_SUB, 1), NONE, jnp.int32)
        spare0 = jnp.full((P_SUB, 1), SPARE_NONE, jnp.int32)
        stk0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        n_alive0 = jnp.sum((ntask0 != NONE).astype(jnp.int32))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
    else:
        n_alive0 = jnp.int32(0)
        for s in range(P_SUB):
            t0s = jnp.where(alive_cnt[s, 0] > 0, jnp.int32(0), NONE)
            ntask_ref[s] = t0s
            sp_ref[s] = jnp.int32(0)
            ltask_ref[s] = NONE  # leaf unit idle (reads the zero row)
            lsp_ref[s] = jnp.int32(0)
            ispare_ref[s] = SPARE_NONE
            lspare_ref[s] = SPARE_NONE
            n_alive0 += (t0s != NONE).astype(jnp.int32)

    # The loop cond ALSO counts down from a static bound that no real
    # traversal can reach (each tree node is visited at most once per
    # sub-warp per query, so visits ≤ nodes + leaf rows). The bound never
    # binds — results are identical — but its presence matters twice:
    # (a) robustness: a miscompiled alive-count can otherwise loop
    #     forever and wedge the device;
    # (b) the 2026-08-18 compile service faults at dispatch on kernels
    #     whose big-bodied while_loop terminates ONLY via a
    #     data-dependent condition (scripts/kernel_morph.py bisect:
    #     v1_while crashes, v6/v7 with a counter in the cond pass).
    def cond(carry):
        return (carry[0] > 0) & (carry[1] > 0)

    def body(carry):
        nbase = 9 if profile else 8
        if profile:
            (iters_left, n_alive, t_best, best, mat, nx, ny, nz,
             citer) = carry[:9]
        else:
            iters_left, n_alive, t_best, best, mat, nx, ny, nz = carry[:8]
        if VSTACK:
            (ntaskC, spC, ispareC, S_i,
             ltaskC, lspC, lspareC, S_l) = carry[nbase:nbase + 8]

        # ---- Task reads (node-row fetches happen inside the
        # internal-phase block below, so INT_COND can skip them).
        if VSTACK:
            ntask_safe = jnp.maximum(ntaskC, 0)                  # (8,1)
            ltask_safe = jnp.where(ltaskC >= 0, ltaskC, zero_row)
            ltasks = [ltask_safe[s, 0] for s in range(P_SUB)]
            any_leaf = jnp.sum((ltaskC != NONE).astype(jnp.int32))
            any_int = jnp.sum((ntaskC != NONE).astype(jnp.int32))
            ntask_scalars = [ntask_safe[s, 0] for s in range(P_SUB)]
        else:
            ntasks, ltasks = [], []
            any_leaf = jnp.int32(0)
            any_int = jnp.int32(0)
            for s in range(P_SUB):
                nt = ntask_ref[s]
                lt = ltask_ref[s]
                ntasks.append(nt)
                ltasks.append(lt)
                any_leaf += (lt != NONE).astype(jnp.int32)
                any_int += (nt != NONE).astype(jnp.int32)
            ntask_scalars = [jnp.where(ntasks[s] >= 0, ntasks[s], 0)
                             for s in range(P_SUB)]

        # Node-row loads issue BEFORE the leaf block when INT_COND is
        # off (the production default), so their latency hides under the
        # leaf MT sweep exactly as in the pre-refactor body; the cond
        # variant must keep them inside the branch to skip them.
        if not INT_COND:
            nrec8_pre = jnp.concatenate(
                [node_ref[pl.ds(ntask_scalars[s], 1)][:, 0:7 * K]
                 for s in range(P_SUB)], axis=0)                 # (8,7K)

        # ---- Leaf unit first (its t_best updates tighten the slabs).
        # Alignment-padding and zero-row records are degenerate
        # (e1=e2=0 → a==0): self-rejecting, no count/leaf-ness gate.
        # The row block (8 row loads + 8 MT sweeps) is skipped when
        # every chain's leaf slot is idle (~25% of iterations — root
        # descent + starvation).
        def row_block(tasks):
            def blk(state):
                trows = [tri_ref[pl.ds(jnp.where(tasks[s] >= 0, tasks[s],
                                                 zero_row), 1)]
                         for s in range(P_SUB)]
                trow8 = jnp.concatenate(trows, axis=0)           # (8,128)
                for k in range(8):
                    trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                    ids = trec[:, 9:11].astype(jnp.int32)  # float-enc
                    state = mt_record(
                        tuple(trec[:, c:c + 1] for c in range(9)),
                        ids[:, 0:1], ids[:, 1:2], state)
                return state
            return blk

        state0_ = (t_best, best, mat, nx, ny, nz)
        if LEAF_COND:
            state = jax.lax.cond(any_leaf > 0, row_block(ltasks),
                                 lambda st: st, state0_)
        else:
            state = row_block(ltasks)(state0_)
        t_best, best, mat, nx, ny, nz = state

        # ---- Internal-unit phases (node fetch, slabs, ordering-key
        # reductions, kind-split sorts, pair packing) — under ONE cond
        # on any live internal unit (INT_COND; pure leaf-drain
        # iterations skip everything and feed the decision phase the
        # exact values it would have derived from all-NONE tasks).
        n_pairs = K // 2
        n_pairs_l = K // 2
        empty_col = jnp.full((P_SUB, 1), EMPTY16, jnp.int32)
        zero_col = jnp.zeros((P_SUB, 1), jnp.int32)
        none_col = jnp.full((P_SUB, 1), NONE, jnp.int32)

        def int_phases(tb):
            if INT_COND:
                nrec8 = jnp.concatenate(
                    [node_ref[pl.ds(ntask_scalars[s], 1)][:, 0:7 * K]
                     for s in range(P_SUB)], axis=0)             # (8,7K)
            else:
                nrec8 = nrec8_pre
            ch8 = nrec8[:, 6 * K:7 * K].astype(jnp.int32)  # float-enc

            def bcol(k, j):
                c = k * 6 + j
                return nrec8[:, c:c + 1]                         # (8,1)

            hks, reps = [], []
            for k in range(K):
                hk, tk = slab(bcol(k, 0), bcol(k, 1), bcol(k, 2),
                              bcol(k, 3), bcol(k, 4), bcol(k, 5), tb)
                hks.append(hk)
                # Ordering key: TRUE nearest entry-t over the sub-warp's
                # hitting lanes (lane-axis min reduction) — the single
                # largest traversal lever found in round 3 (order_study:
                # lane-0 keys cost 105.4 packet-lockstep iterations vs
                # 65.4 with the true key on bvh8 bounce rays).
                reps.append(jnp.min(jnp.where(hk, tk, BIG), axis=1,
                                    keepdims=True))              # (8,1)
            # Only cross-lane work: K/2 LANE-axis reductions of
            # bit-packed per-child hit counts (each count ≤ 128).
            packs = [jnp.sum(hks[i].astype(jnp.int32)
                             + (hks[i + 1].astype(jnp.int32) << 16),
                             axis=1, keepdims=True)              # (8,1)
                     for i in range(0, K, 2)]

            # Vector decision prep: hit masks, entry keys, and the two
            # kind-split sort networks run on (8,K) tiles — one
            # instruction stream orders the children of all 8 chains at
            # once. Empty slots carry (+inf,-inf) boxes, which the
            # UNORDERED slab reads as tmin=-inf → "hit"; gate with ids.
            anyk_cols = []
            for p2 in packs:
                anyk_cols.extend([p2 & 0xFFFF, p2 >> 16])
            anyk = jnp.concatenate(anyk_cols, axis=1) > 0
            valid = anyk & (ch8 != NONE)                         # (8,K)
            rep4 = jnp.concatenate(reps, axis=1)                 # (8,K)
            is_leaf4 = ch8 <= -2
            k_int = jnp.where(valid & ~is_leaf4, rep4, BIG)
            k_leaf = jnp.where(valid & is_leaf4, rep4, BIG)

            from raytracer_tpu.ops.bvh4 import SORT_PAIRS

            def vsortk(keys, codes):
                kc = [keys[:, k:k + 1] for k in range(K)]
                cc = [codes[:, k:k + 1] for k in range(K)]
                for (i, j) in SORT_PAIRS[K]:
                    sw = kc[i] > kc[j]
                    kc[i], kc[j] = (jnp.where(sw, kc[j], kc[i]),
                                    jnp.where(sw, kc[i], kc[j]))
                    cc[i], cc[j] = (jnp.where(sw, cc[j], cc[i]),
                                    jnp.where(sw, cc[i], cc[j]))
                return kc, cc

            ki, ci = vsortk(k_int, ch8)   # internal children, near-first
            kl, cl = vsortk(k_leaf, ch8)  # leaf children, near-first
            n_int = (ki[0] < BIG).astype(jnp.int32)
            n_leaf = (kl[0] < BIG).astype(jnp.int32)
            for k in range(1, K):
                n_int = n_int + (ki[k] < BIG).astype(jnp.int32)
                n_leaf = n_leaf + (kl[k] < BIG).astype(jnp.int32)

            # PAIR-PACKED push prep (vector): both stacks store TWO
            # 16-bit codes per 32-bit entry (ids < 2^16, asserted at
            # pack time). Deferred rank r (r=1..K-1) rides in pair
            # (r-1)//2's low half (odd r) or high half (even r);
            # missing ranks encode EMPTY16. Pop order is IDENTICAL to
            # the one-code-per-entry scheme (see the spare-register
            # discipline in the decision phase below).
            ci_e = [jnp.where(ki[k] < BIG, ci[k], EMPTY16)
                    for k in range(1, K)]
            ci_e.append(empty_col)
            cl_e = [jnp.where(kl[k] < BIG, -cl[k] - 2, EMPTY16)
                    for k in range(1, K)]
            cl_e.append(empty_col)
            pair_i = [jnp.bitwise_or(ci_e[2 * pe],
                                     jnp.left_shift(ci_e[2 * pe + 1], 16))
                      for pe in range(n_pairs)]
            # Leaf pairs: the nearest leaf child feeds the row slot
            # directly; pairs hold ranks 1..K-1.
            pair_l = [jnp.bitwise_or(cl_e[2 * pe],
                                     jnp.left_shift(cl_e[2 * pe + 1], 16))
                      for pe in range(n_pairs_l)]
            lA = -cl[0] - 2
            return (n_int, n_leaf, ci[0], lA) + tuple(pair_i) + tuple(pair_l)

        def int_idle(tb):
            return ((zero_col, zero_col, none_col, none_col)
                    + (empty_col,) * (n_pairs + n_pairs_l))

        if INT_COND:
            dec = jax.lax.cond(any_int > 0, int_phases, int_idle, t_best)
        else:
            dec = int_phases(t_best)
        n_int, n_leaf, ci0_col, lA_col = dec[:4]
        pair_i = list(dec[4:4 + n_pairs])
        pair_l = list(dec[4 + n_pairs:4 + n_pairs + n_pairs_l])

        def low16(x):
            return jnp.bitwise_and(x, EMPTY16)

        def consume(x):  # drop the low half; high half becomes the low
            return jnp.bitwise_or(
                jnp.bitwise_and(jnp.right_shift(x, 16), EMPTY16), SPARE_HIGH)

        if VSTACK:
            # ---- VECTOR decision phase: the same per-chain formulas as
            # the scalar branch below, expressed once on (8,1) columns.
            # Stack pushes write through `lane == position` masks into
            # the (8,128) pointer stacks (positions past the clamp or
            # with nothing to push compare as -1 → no lane matches → a
            # no-op, the masked analog of the scalar junk-above-top
            # discipline); pops read back via one masked lane-reduction.
            stallC = lspC >= stack_cap - 4 - K
            is_intC = (ntaskC >= 0) & ~stallC
            nh_i = jnp.where(is_intC, n_int, 0)
            nh_l = jnp.where(is_intC, n_leaf, 0)

            # Internal unit.
            has_spare = low16(ispareC) != EMPTY16
            ne = nh_i >> 1
            spare_push = has_spare & (ne > 0)
            pos = jnp.where(spare_push, spC, -1)
            S_i = jnp.where(lane_i == pos, ispareC, S_i)
            sp_eff = spC + spare_push.astype(jnp.int32)
            for pe in range(n_pairs):
                pos = jnp.where(pe < ne, sp_eff + (ne - 1 - pe), -1)
                S_i = jnp.where(lane_i == pos, pair_i[pe], S_i)
            new_sp = jnp.minimum(sp_eff + ne, stack_cap - 4)
            desc = jnp.where(nh_i > 0, ci0_col, NONE)
            spare1 = jnp.where(spare_push, SPARE_NONE, ispareC)
            has_spare1 = has_spare & ~spare_push
            live = ~stallC & (desc == NONE) & (ntaskC != NONE)
            use_spare = live & has_spare1
            do_pop = live & ~has_spare1 & (new_sp > 0)
            popped = jnp.sum(jnp.where(lane_i == new_sp - 1, S_i, 0),
                             axis=1, keepdims=True)
            nxt = jnp.where(stallC, ntaskC,
                  jnp.where(desc != NONE, desc,
                  jnp.where(use_spare, low16(spare1),
                  jnp.where(do_pop, low16(popped), NONE))))
            ispareC = jnp.where(use_spare, consume(spare1),
                      jnp.where(do_pop, consume(popped), spare1))
            ntaskC = nxt
            spC = jnp.where(do_pop, new_sp - 1, new_sp)

            # Leaf unit.
            l_has = low16(lspareC) != EMPTY16
            nle = nh_l >> 1
            l_spush = l_has & (nle > 0)
            pos = jnp.where(l_spush, lspC, -1)
            S_l = jnp.where(lane_i == pos, lspareC, S_l)
            lsp_eff = lspC + l_spush.astype(jnp.int32)
            for pe in range(n_pairs_l):
                pos = jnp.where(pe < nle, lsp_eff + (nle - 1 - pe), -1)
                S_l = jnp.where(lane_i == pos, pair_l[pe], S_l)
            new_lsp = jnp.minimum(lsp_eff + nle, stack_cap - 4)
            lt0 = jnp.where(nh_l > 0, lA_col, NONE)
            lspare1 = jnp.where(l_spush, SPARE_NONE, lspareC)
            l_has1 = l_has & ~l_spush
            l_use = (lt0 == NONE) & l_has1
            l_pop = (lt0 == NONE) & ~l_has1 & (new_lsp > 0)
            l_popped = jnp.sum(jnp.where(lane_i == new_lsp - 1, S_l, 0),
                               axis=1, keepdims=True)
            ltA = jnp.where(lt0 != NONE, lt0,
                  jnp.where(l_use, low16(lspare1),
                  jnp.where(l_pop, low16(l_popped), NONE)))
            lspareC = jnp.where(l_use, consume(lspare1),
                      jnp.where(l_pop, consume(l_popped), lspare1))
            ltaskC = ltA
            lspC = jnp.where(l_pop, new_lsp - 1, new_lsp)

            alive_col = ((ntaskC != NONE) | (ltaskC != NONE))
            new_alive = jnp.sum(alive_col.astype(jnp.int32))
            out = [iters_left - 1, new_alive, t_best, best, mat, nx, ny, nz]
            if profile:
                out.append(citer + alive_col.astype(jnp.float32))
            out.extend([ntaskC, spC, ispareC, S_i,
                        ltaskC, lspC, lspareC, S_l])
            return tuple(out)

        # ---- Scalar phase per chain: push pairs, pop/consume spares.
        new_alive = jnp.int32(0)
        alive_flags = []
        for s in range(P_SUB):
            nt = ntasks[s]
            is_int = nt >= 0
            sp = sp_ref[s]
            lsp = lsp_ref[s]
            # STALL guard: if the leaf stack is nearly full, re-schedule
            # this node (recomputed next iteration) while the leaf unit
            # drains — a sound lstack bound without a growable queue.
            stall = lsp >= stack_cap - 4 - K
            nh_i = jnp.where(is_int & ~stall, n_int[s, 0], 0)
            nh_l = jnp.where(is_int & ~stall, n_leaf[s, 0], 0)
            base = s * stack_cap

            # Internal unit. ne = ceil((nh-1)/2) pair entries. The spare
            # store at sp is unconditional (junk above the top when
            # unused; overwritten by the pair stores when spare_push is
            # false — invalid/high pe stores land first and valid ones
            # overwrite, same branchless discipline as v6).
            spare = ispare_ref[s]
            has_spare = low16(spare) != EMPTY16
            ne = nh_i >> 1
            spare_push = has_spare & (ne > 0)
            stack_ref[base + sp] = spare
            sp_eff = sp + spare_push.astype(jnp.int32)
            for pe in range(n_pairs - 1, -1, -1):
                stack_ref[base + sp_eff + jnp.maximum(ne - 1 - pe, 0)] = (
                    pair_i[pe][s, 0])
            # Clamped at stack_cap-4: with callers allocating the build-
            # time worst-case bound +4 headroom this NEVER binds; it
            # exists so no codegen or bound bug can ever turn into an
            # out-of-bounds SMEM write, which faults the whole device
            # under the 2026-08-18 runtime (kernel_morph.py v11).
            new_sp = jnp.minimum(sp_eff + ne, stack_cap - 4)
            desc = jnp.where(nh_i > 0, ci0_col[s, 0], NONE)
            spare1 = jnp.where(spare_push, SPARE_NONE, spare)
            has_spare1 = has_spare & ~spare_push
            use_spare = ~stall & (desc == NONE) & has_spare1 & (nt != NONE)
            do_pop = (~stall & (desc == NONE) & ~has_spare1
                      & (new_sp > 0) & (nt != NONE))
            popped = stack_ref[base + jnp.maximum(new_sp - 1, 0)]
            nxt = jnp.where(stall, nt,
                  jnp.where(desc != NONE, desc,
                  jnp.where(use_spare, low16(spare1),
                  jnp.where(do_pop, low16(popped), NONE))))
            ispare_ref[s] = jnp.where(use_spare, consume(spare1),
                            jnp.where(do_pop, consume(popped), spare1))
            ntask_ref[s] = nxt
            sp_ref[s] = jnp.where(do_pop, new_sp - 1, new_sp)

            # Leaf unit: same pair discipline as the internal unit;
            # codes are tri rows.
            lspare = lspare_ref[s]
            l_has = low16(lspare) != EMPTY16
            nle = nh_l >> 1
            l_spush = l_has & (nle > 0)
            lstack_ref[base + lsp] = lspare
            lsp_eff = lsp + l_spush.astype(jnp.int32)
            for pe in range(n_pairs_l - 1, -1, -1):
                lstack_ref[base + lsp_eff
                           + jnp.maximum(nle - 1 - pe, 0)] = (
                    pair_l[pe][s, 0])
            new_lsp = jnp.minimum(lsp_eff + nle, stack_cap - 4)
            lt0 = jnp.where(nh_l > 0, lA_col[s, 0], NONE)
            lspare1 = jnp.where(l_spush, SPARE_NONE, lspare)
            l_has1 = l_has & ~l_spush
            l_use = (lt0 == NONE) & l_has1
            l_pop = (lt0 == NONE) & ~l_has1 & (new_lsp > 0)
            l_popped = lstack_ref[base + jnp.maximum(new_lsp - 1, 0)]
            ltA = jnp.where(lt0 != NONE, lt0,
                  jnp.where(l_use, low16(lspare1),
                  jnp.where(l_pop, low16(l_popped), NONE)))
            lspare_ref[s] = jnp.where(l_use, consume(lspare1),
                            jnp.where(l_pop, consume(l_popped), lspare1))
            ltask_ref[s] = ltA
            lsp_ref[s] = jnp.where(l_pop, new_lsp - 1, new_lsp)

            chain_alive = (nxt != NONE) | (ltA != NONE)
            alive_flags.append(chain_alive)
            new_alive += chain_alive.astype(jnp.int32)

        out = [iters_left - 1, new_alive, t_best, best, mat, nx, ny, nz]
        if profile:
            rows = [jnp.full((1, P_LANE), af.astype(jnp.float32))
                    for af in alive_flags]
            out.append(citer + jnp.concatenate(rows, axis=0))
        return tuple(out)

    init = [jnp.int32(max_iters), n_alive0, t_best0, best0, mat0,
            n0x, n0y, n0z]
    if profile:
        # Seed with 1 per initially-alive chain (the first iteration's
        # work happens before the end-of-body count).
        if VSTACK:
            init.append((alive_cnt > 0).astype(jnp.float32)
                        * jnp.ones((P_SUB, P_LANE), jnp.float32))
        else:
            seed = [jnp.full((1, P_LANE),
                             (alive_cnt[s, 0] > 0).astype(jnp.float32))
                    for s in range(P_SUB)]
            init.append(jnp.concatenate(seed, axis=0))
    if VSTACK:
        assert stack_cap <= P_LANE, (
            f"vector-stack capacity is {P_LANE} lanes; build stack bound "
            f"{stack_cap} exceeds it (set RAYTRACER_TPU_VSTACK=0)")
        init.extend([ntask0, zero_col_i, spare0, stk0,
                     ltask0, zero_col_i, spare0, stk0])
    # UNROLL: run N traversal bodies per while iteration, paying the
    # loop machinery (cond eval + carry plumbing + branch) once per N.
    # Output-exact: a body run on a drained state is a no-op (NONE
    # tasks gate every push/pop/descend; idle leaf slots read the
    # degenerate zero row, whose records self-reject), so overshooting
    # the drain point by up to N-1 bodies changes nothing.
    loop_body = body
    if UNROLL > 1:
        def loop_body(carry):
            for _ in range(UNROLL):
                carry = body(carry)
            return carry
    out = jax.lax.while_loop(cond, loop_body, tuple(init))
    if profile:
        return (out[2], out[3], out[4], out[5], out[6], out[7], out[8],
                jnp.int32(max_iters) - out[0])
    return out[2], out[3], out[4], out[5], out[6], out[7]


def _kernel_body(t_min, stack_cap, zero_row, max_iters,
                 n_children, brute_trows, root_lo, root_hi, p,
                 node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                 t_out_ref, id_out_ref, mat_out_ref,
                 nx_out_ref, ny_out_ref, nz_out_ref,
                 ntask_ref, sp_ref, ltask_ref, lsp_ref,
                 stack_ref, lstack_ref, ispare_ref, lspare_ref):
    """DUAL-UNIT SUB-WARP traversal (v6): the 8 sublane rows of the
    (8,128) packet are independent 128-ray sub-warps (chains); each
    iteration advances every chain by ONE internal-node expansion (from
    an internal-only SMEM stack) AND ONE leaf-row Möller–Trumbore sweep
    (from a separate leaf-row SMEM stack), both straight-line (no
    lax.cond). In v5 a leaf visit burned a whole iteration whose slab
    phase was garbage; with split work units, iterations per bounce
    sweep drop 64 → ~45 on interior bounce rays at the same chain-visit
    count (scripts/dual_unit_study.py).

    Cost model (calibrated by scripts/kernel_floor_probe.py and the
    scalar-op analysis in ROADMAP): Mosaic scalar ops are ~1 ns each
    and vreg→scalar extracts ~3 ns; the iteration cost IS the scalar op
    count. Hence (a) the node table is ROW-PER-NODE (task == row id, no
    //4 %4 or select chain), and (b) child ordering — hit masks, entry
    keys, and the kind-split sort4 networks — runs on (8,4) VECTOR
    tiles for all 8 chains at once; the scalar phase only extracts the
    sorted codes it actually pushes.

    The leaf stack is bounded by a STALL guard: if it nears capacity,
    the internal unit re-schedules its current node (recomputed next
    iteration) while the leaf unit drains — a sound bound without a
    growable queue. Sub-warps with no leaf pending read the dedicated
    all-zero triangle row (degenerate records self-reject).

    (The traversal itself lives in `traverse_tile` above, shared with
    the fused path-loop megakernel; this wrapper just loads the packet's
    ray tiles and stores the result tiles.)"""
    o_pk = o_ref[pl.ds(p, 1)][0]                                 # (3,8,128)
    d_pk = d_ref[pl.ds(p, 1)][0]
    ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]                       # (8,128)
    dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
    t_lim = tlim_ref[pl.ds(p, 1)][0]                             # (8,128)

    t_best, best, mat, nx, ny, nz = traverse_tile(
        t_min, stack_cap, zero_row, max_iters, n_children,
        brute_trows, root_lo, root_hi, node_ref, tri_ref,
        ox, oy, oz, dx, dy, dz, t_lim,
        ntask_ref, sp_ref, ltask_ref, lsp_ref, stack_ref, lstack_ref,
        ispare_ref, lspare_ref)
    t_out_ref[pl.ds(p, 1)] = t_best[None]
    id_out_ref[pl.ds(p, 1)] = best[None]
    mat_out_ref[pl.ds(p, 1)] = mat[None]
    nx_out_ref[pl.ds(p, 1)] = nx[None]
    ny_out_ref[pl.ds(p, 1)] = ny[None]
    nz_out_ref[pl.ds(p, 1)] = nz[None]


@functools.partial(jax.jit,
                   static_argnames=("t_min", "interpret", "stack_cap",
                                    "n_brute_rows", "n_children"))
def _traverse_packets(node_pack, tri_pack, o_pk, d_pk, tlim_pk,
                      t_min=1e-3, interpret=False, stack_cap=STACK_CAP,
                      n_brute_rows=0, n_children=4):
    g = o_pk.shape[0]
    zero_row = tri_pack.shape[0] - 1  # dedicated degenerate row
    brute_rows = tuple(range(zero_row - n_brute_rows, zero_row))
    # Sound traversal-iteration bound: every iteration with any unit
    # alive performs at least one node expansion or one leaf-row sweep,
    # each tree node is expanded at most once per sub-warp per query,
    # and each leaf row is swept at most once — so iterations ≤ nodes +
    # leaf rows. Never binds in practice (~45 iters).
    max_iters = node_pack.shape[0] + (zero_row - n_brute_rows) + 8

    def launch(args):
        o_c, d_c, t_c = args
        gc = o_c.shape[0]
        return pl.pallas_call(
            _make_kernel(t_min, gc, stack_cap, zero_row, brute_rows, max_iters,
                         n_children),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_shape=[
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.float32),
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.int32),
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.int32),
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.float32),
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.float32),
                jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(node_pack, tri_pack, o_c, d_c, t_c)

    if g <= MAX_PACKETS_PER_CALL:
        return launch((o_pk, d_pk, tlim_pk))

    # Big wavefronts: map over fixed-size packet chunks (pad the last).
    chunk = MAX_PACKETS_PER_CALL
    pad_g = (-g) % chunk
    if pad_g:
        o_pk = jnp.concatenate([o_pk, jnp.zeros((pad_g,) + o_pk.shape[1:], o_pk.dtype)])
        d_pk = jnp.concatenate([d_pk, jnp.ones((pad_g,) + d_pk.shape[1:], d_pk.dtype)])
        tlim_pk = jnp.concatenate(
            [tlim_pk, jnp.full((pad_g,) + tlim_pk.shape[1:], -1.0, tlim_pk.dtype)])
    n_chunks = (g + pad_g) // chunk
    o_c = o_pk.reshape((n_chunks, chunk) + o_pk.shape[1:])
    d_c = d_pk.reshape((n_chunks, chunk) + d_pk.shape[1:])
    t_c = tlim_pk.reshape((n_chunks, chunk) + tlim_pk.shape[1:])
    outs = jax.lax.map(launch, (o_c, d_c, t_c))
    outs = [x.reshape((-1,) + x.shape[2:])[:g] for x in outs]
    return tuple(outs)


def trace_closest_pallas(origins, dirs, bvh4: Bvh4, t_max, t_min: float = 1e-3,
                         sort: bool = True, interpret: bool = False):
    """Full closest-hit record via the Pallas packet kernel, with ZERO
    XLA gathers after the launch (the kernel returns the winning
    triangle's material id and geometric normal, so the wavefront's
    shade stage needs no table lookups).

    Returns dict with t (BIG on miss), tri_id (original face order),
    mat_id, normal (unnormalized geometric cross(e1,e2)), hit — all [N].
    """
    n = origins.shape[0]
    t_hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    pad = (-n) % PACKET

    if sort:
        # Dynamic coherence sort. Note: the permute/unpermute machinery
        # costs ~10 gather thunks per call on this backend; callers with
        # statically coherent ray order (screen-tiled wavefront lanes)
        # should pass sort=False, which is gather-free.
        from raytracer_tpu.ops.packets import _coherence_keys

        lo = jnp.min(bvh4.bounds[0, :, 0:3], axis=0)
        hi_b = jnp.where(bvh4.bounds[0, :, 3:6] > -BIG, bvh4.bounds[0, :, 3:6], -BIG)
        hi = jnp.max(hi_b, axis=0)
        keys = _coherence_keys(origins, dirs, lo, 1.0 / jnp.maximum(hi - lo, 1e-12))
        perm = jnp.argsort(keys).astype(jnp.int32)
        if pad:
            perm_p = jnp.concatenate([perm, jnp.zeros((pad,), jnp.int32)])
            valid = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((pad,), bool)])
        else:
            perm_p = perm
            valid = jnp.ones((n,), bool)
        o_in = origins[perm_p]
        d_in = dirs[perm_p]
        t_in = jnp.where(valid, t_hi[perm_p], -1.0)
    else:
        if pad:
            o_in = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
            d_in = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
            t_in = jnp.concatenate([t_hi, jnp.full((pad,), -1.0, jnp.float32)])
        else:
            o_in, d_in, t_in = origins, dirs, t_hi

    g = (n + pad) // PACKET
    o_pk = o_in.reshape(g, PACKET, 3).transpose(0, 2, 1).reshape(g, 3, P_SUB, P_LANE)
    d_pk = d_in.reshape(g, PACKET, 3).transpose(0, 2, 1).reshape(g, 3, P_SUB, P_LANE)
    tlim = t_in.reshape(g, P_SUB, P_LANE)

    fmat = bvh4.face_mat
    if fmat is None:
        fmat = jnp.zeros((bvh4.tri.shape[0],), jnp.int32)
    # +4 headroom above the build-time worst-case bound so the kernel's
    # overflow clamp (stack_cap - 4) never binds on a correct build. The
    # leaf stack shares the same capacity; it is bounded by the in-kernel
    # stall guard (internal unit pauses when lsp >= stack_cap - 8), so
    # overflow is impossible by construction rather than by a bound.
    stack_cap = bvh4.stack_depth + 4
    assert stack_cap <= STACK_CAP, (
        f"BVH4 stack bound {bvh4.stack_depth}+4 exceeds kernel capacity {STACK_CAP}")
    node_pack, tri_pack, _, n_brute_rows = _pack_tables_v6(bvh4, fmat)
    t_pk, id_pk, m_pk, nx_pk, ny_pk, nz_pk = _traverse_packets(
        node_pack, tri_pack, o_pk, d_pk, tlim, t_min=t_min, interpret=interpret,
        stack_cap=stack_cap, n_brute_rows=n_brute_rows,
        n_children=int(bvh4.children.shape[1]),
    )

    if sort:
        inv_src = perm_p.at[n:].set(jnp.int32(2**30)) if pad else perm_p
        inv = jnp.argsort(inv_src)
        if pad:
            inv = inv[:n]

        def unpack(x):
            return x.reshape(-1)[inv]
    else:

        def unpack(x):
            return x.reshape(-1)[:n]

    t_sorted = unpack(t_pk)
    id_sorted = unpack(id_pk)
    found = id_sorted >= 0
    normal = jnp.stack([unpack(nx_pk), unpack(ny_pk), unpack(nz_pk)], axis=-1)
    return {
        "t": jnp.where(found, t_sorted, BIG),
        "tri_id": jnp.where(found, id_sorted, 0),
        "mat_id": jnp.where(found, unpack(m_pk), 0),
        "normal": normal,
        "hit": found,
    }


def intersect_bvh4_pallas(origins, dirs, bvh4: Bvh4, t_min, t_max,
                          sort: bool = True, interpret: bool = False):
    """Closest triangle hit via the Pallas packet kernel. Same contract
    as ops/bvh4.intersect_bvh4: (t f32[N] BIG-on-miss, tri_id i32[N])."""
    rec = trace_closest_pallas(origins, dirs, bvh4, t_max, t_min=float(t_min),
                               sort=sort, interpret=interpret)
    return rec["t"], rec["tri_id"]
