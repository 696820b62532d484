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

Hence the layout: BVH4 nodes are packed FOUR per 128-lane row
(32 lanes each: 24 bounds floats + 4 child ids bitcast to f32), and
triangles EIGHT per row (16 lanes each: v0,e1,e2, prim id, material id)
with every LEAF 8-aligned to one row (bvh4.align_leaves_to_rows) — a
leaf visit is ONE dynamically-indexed aligned row load and 8 static
record slices. The kernel runs without a Pallas grid: a fori_loop walks
all packets of one launch (grid pipelining would double-buffer the
resident tables), each packet being 8×128 = 1024 rays whose slab tests
and Möller–Trumbore run as full (8,128)-tile VPU ops against
scalar-broadcast node data; each packet keeps a scalar node stack in
SMEM. A packet descends into a child iff ANY of its rays hits the child
box; per-ray t_best keeps closest-hit exact (equivalence-tested against
brute force).

Per-visit cost discipline (measured ~1 µs/visit before, dominated by
cross-lane reductions and branches, not vector math): an internal visit
does exactly TWO full-vreg reductions (bit-packed per-child hit counts),
orders children by a representative-ray scalar key, and pushes with
branchless clamped SMEM stores; a leaf visit does zero reductions.

Rays arrive pre-sorted for coherence — either by the wavefront's static
8×128 screen-tile lane order (sort=False, the default fast path) or by
a dynamic (direction octant, origin Morton) sort.

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
STACK_CAP = 256  # SMEM entries (1 KB); build asserts stack_depth <= this
# Packets per kernel launch (bounds the launch's ray/output VMEM).
MAX_PACKETS_PER_CALL = 512  # bounds ray/output VMEM alongside the tables
NODE_STRIDE = 32  # lanes per node record (4 per row)
TRI_STRIDE = 16   # lanes per triangle record (8 per row)


def _pack_tables(bvh4: Bvh4, fmat: jnp.ndarray):
    """Host/jit-side packing into the kernel's aligned-row layout."""
    n4 = bvh4.bounds.shape[0]
    t = bvh4.tri.shape[0]

    # Nodes: [ceil(n4/4), 128] f32; node n at row n//4, lanes 32*(n%4):
    # child-box bounds (24: per child min x,y,z then max x,y,z) +
    # child codes (4, bitcast i32→f32) + pad (4).
    node_vals = jnp.concatenate(
        [bvh4.bounds.reshape(n4, 24),
         jax.lax.bitcast_convert_type(bvh4.children, jnp.float32),
         jnp.zeros((n4, NODE_STRIDE - 28), jnp.float32)], axis=1)  # [n4,32]
    pad_n = (-n4) % 4
    if pad_n:
        node_vals = jnp.concatenate(
            [node_vals, jnp.zeros((pad_n, NODE_STRIDE), jnp.float32)])
    node_pack = node_vals.reshape(-1, 4 * NODE_STRIDE)  # [ceil(n4/4),128]

    # Triangles: [t/8, 128] f32; tri k at row k//8, lanes 16*(k%8):
    # [v0(3) e1(3) e2(3) prim(bitcast) mat(bitcast) pad(5)].
    # Leaf ranges are 8-aligned (bvh4.align_leaves_to_rows), so one leaf
    # == one row and t % 8 == 0; the kernel fetches a leaf with a single
    # aligned row load and static record slices.
    assert t % 8 == 0, "Bvh4 triangle table must be leaf-row aligned"
    tri_vals = jnp.concatenate(
        [bvh4.tri,
         jax.lax.bitcast_convert_type(bvh4.prim_index, jnp.float32)[:, None],
         jax.lax.bitcast_convert_type(fmat, jnp.float32)[:, None],
         jnp.zeros((t, TRI_STRIDE - 11), jnp.float32)], axis=1)  # [t,16]
    tri_pack = tri_vals.reshape(-1, 8 * TRI_STRIDE)  # [t/8,128]
    return node_pack, tri_pack


def _select_record(row, sub, n_options, stride):
    """row: (1,128); sub: scalar in [0,n_options) → (1,stride) via a
    static-slice select chain (dynamic lane offsets are not allowed)."""
    rec = row[:, 0:stride]
    for q in range(1, n_options):
        rec = jnp.where(sub == q, row[:, q * stride:(q + 1) * stride], rec)
    return rec


def _make_kernel(t_min: float, n_packets: int):
    def kernel(node_ref, tri_ref, o_ref, d_ref, tlim_ref,
               t_out_ref, id_out_ref, mat_out_ref,
               nx_out_ref, ny_out_ref, nz_out_ref):
        def body_scoped(stack_ref):
            def per_packet(p, _):
                _kernel_body(t_min, p, node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                             t_out_ref, id_out_ref, mat_out_ref,
                             nx_out_ref, ny_out_ref, nz_out_ref, stack_ref)
                return 0

            jax.lax.fori_loop(0, n_packets, per_packet, 0)

        pl.run_scoped(body_scoped, pltpu.SMEM((STACK_CAP,), jnp.int32))

    return kernel


def _kernel_body(t_min, p, node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                 t_out_ref, id_out_ref, mat_out_ref,
                 nx_out_ref, ny_out_ref, nz_out_ref, stack_ref):
    o_pk = o_ref[pl.ds(p, 1)][0]                                 # (3,8,128)
    d_pk = d_ref[pl.ds(p, 1)][0]
    ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]                       # (8,128)
    dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
    ix = 1.0 / dx
    iy = 1.0 / dy
    iz = 1.0 / dz

    t_best0 = tlim_ref[pl.ds(p, 1)][0]                           # (8,128)
    best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
    mat0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
    n0 = jnp.zeros((P_SUB, P_LANE), jnp.float32)

    def bval(rec, k, j):
        """Child k's bound j within a (1,32) node record."""
        return rec[0, k * 6 + j]

    def node_record(ni):
        """→ (record (1,32) f32, children (1,4) i32)."""
        row = node_ref[pl.ds(ni // 4, 1)]                        # (1,128)
        rec = _select_record(row, ni % 4, 4, NODE_STRIDE)        # (1,32)
        ch = jax.lax.bitcast_convert_type(rec[:, 24:28], jnp.int32)
        return rec, ch

    def slab(lx, ly, lz, hx, hy, hz, t_best):
        t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
        t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
        t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        return tmax > tmin, tmin

    # Root box = union of node 0's child boxes (static row-0 reads).
    rec0 = node_ref[0:1, 0:NODE_STRIDE]
    neg = jnp.float32(-BIG)
    finite = [bval(rec0, k, 3) > -BIG for k in range(4)]

    def min4(j):
        return jnp.minimum(jnp.minimum(bval(rec0, 0, j), bval(rec0, 1, j)),
                           jnp.minimum(bval(rec0, 2, j), bval(rec0, 3, j)))

    def max4(j):
        vals = [jnp.where(finite[k], bval(rec0, k, j), neg) for k in range(4)]
        return jnp.maximum(jnp.maximum(vals[0], vals[1]),
                           jnp.maximum(vals[2], vals[3]))

    rhit, _ = slab(min4(0), min4(1), min4(2), max4(3), max4(4), max4(5), t_best0)
    start = jnp.where(jnp.any(rhit), 0, NONE)

    def cond(carry):
        return carry[0] != NONE

    def internal_step(carry):
        task, sp, t_best, best, mat, nx, ny, nz = carry
        rec, ch = node_record(task)

        # Slab-test all 4 children; the ONLY cross-lane reductions are
        # two bit-packed hit-count sums (counts <= 1024 fit 16 bits) —
        # full-vreg reductions are the dominant per-visit cost, so the
        # 4x any + 4x min of the previous version are collapsed here.
        hks, tks = [], []
        for k in range(4):
            hk, tk = slab(bval(rec, k, 0), bval(rec, k, 1), bval(rec, k, 2),
                          bval(rec, k, 3), bval(rec, k, 4), bval(rec, k, 5), t_best)
            hks.append(hk)
            tks.append(tk)
        pa = jnp.sum(hks[0].astype(jnp.int32) + (hks[1].astype(jnp.int32) << 16))
        pb = jnp.sum(hks[2].astype(jnp.int32) + (hks[3].astype(jnp.int32) << 16))
        anyk = [(pa & 0xFFFF) > 0, (pa >> 16) > 0, (pb & 0xFFFF) > 0, (pb >> 16) > 0]
        # Empty slots carry (+inf,-inf) boxes, which the UNORDERED slab
        # reads as tmin=-inf -> "hit"; gate them out with scalar ANDs.
        anyk = [a & (ch[0, k] != NONE) for k, a in enumerate(anyk)]
        nhit = (anyk[0].astype(jnp.int32) + anyk[1].astype(jnp.int32)
                + anyk[2].astype(jnp.int32) + anyk[3].astype(jnp.int32))

        # Child ordering by a REPRESENTATIVE ray (lane (0,0)): a scalar
        # heuristic, free of reductions. Visited children whose rep ray
        # misses order after rep-hit ones; correctness is unaffected
        # (per-ray t_best keeps closest-hit exact in any visit order).
        tm = [jnp.where(anyk[k],
                        jnp.where(hks[k], tks[k], HALF_BIG)[0, 0],
                        BIG) for k in range(4)]
        cc = [ch[0, 0], ch[0, 1], ch[0, 2], ch[0, 3]]
        for (i, j) in ((0, 2), (1, 3), (0, 1), (2, 3), (1, 2)):
            swap = tm[i] > tm[j]
            tm[i], tm[j] = (jnp.where(swap, tm[j], tm[i]), jnp.where(swap, tm[i], tm[j]))
            cc[i], cc[j] = (jnp.where(swap, cc[j], cc[i]), jnp.where(swap, cc[i], cc[j]))

        # Branchless far-to-near pushes: child k (k=1..nhit-1) belongs at
        # sp + (nhit-1-k); non-pushed ks clamp to sp and are overwritten
        # by the valid k stored later (decreasing k), or left dead below
        # new_sp. No pl.when branches.
        for k in (3, 2, 1):
            pos = sp + jnp.maximum(nhit - 1 - k, 0)
            stack_ref[pos] = cc[k]
        new_sp = sp + jnp.maximum(nhit - 1, 0)
        desc = jnp.where(nhit > 0, cc[0], NONE)
        return desc, new_sp, t_best, best, mat, nx, ny, nz

    def leaf_step(carry):
        task, sp, t_best, best, mat, nx, ny, nz = carry
        code = -task - 2
        # Leaf rows are 8-aligned: lo = code//8 with lo%8 == 0, so the
        # whole leaf is ONE row (code//64) and every record is a STATIC
        # 16-lane slice — a single dynamic load per leaf visit.
        leaf_count = code % 8 + 1
        trow = tri_ref[pl.ds(code // 64, 1)]                     # (1,128)
        for k in range(8):
            trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]  # (1,16)
            v0x, v0y, v0z = trec[0, 0], trec[0, 1], trec[0, 2]
            e1x, e1y, e1z = trec[0, 3], trec[0, 4], trec[0, 5]
            e2x, e2y, e2z = trec[0, 6], trec[0, 7], trec[0, 8]
            ids = jax.lax.bitcast_convert_type(trec[:, 9:11], jnp.int32)
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
            ok &= k < leaf_count
            t_best = jnp.where(ok, t, t_best)
            best = jnp.where(ok, ids[0, 0], best)
            mat = jnp.where(ok, ids[0, 1], mat)
            # Geometric (unnormalized) face normal of the winning
            # triangle — normalized outside (reference Core/Mesh.cuh:303).
            nx = jnp.where(ok, e1y * e2z - e1z * e2y, nx)
            ny = jnp.where(ok, e1z * e2x - e1x * e2z, ny)
            nz = jnp.where(ok, e1x * e2y - e1y * e2x, nz)
        return NONE, sp, t_best, best, mat, nx, ny, nz

    def body(carry):
        # Branch on node type: internal visits skip the 4 Möller–Trumbore
        # sweeps, leaf visits skip the child slab tests (~40% per-visit).
        next_task, new_sp, t_best, best, mat, nx, ny, nz = jax.lax.cond(
            carry[0] >= 0, internal_step, leaf_step, carry)

        do_pop = (next_task == NONE) & (new_sp > 0)
        popped = stack_ref[jnp.maximum(new_sp - 1, 0)]
        next_task = jnp.where(do_pop, popped, next_task)
        new_sp = jnp.where(do_pop, new_sp - 1, new_sp)
        return next_task, new_sp, t_best, best, mat, nx, ny, nz

    _, _, t_best, best, mat, nx, ny, nz = jax.lax.while_loop(
        cond, body, (start, jnp.int32(0), t_best0, best0, mat0, n0, n0, n0)
    )
    t_out_ref[pl.ds(p, 1)] = t_best[None]
    id_out_ref[pl.ds(p, 1)] = best[None]
    mat_out_ref[pl.ds(p, 1)] = mat[None]
    nx_out_ref[pl.ds(p, 1)] = nx[None]
    ny_out_ref[pl.ds(p, 1)] = ny[None]
    nz_out_ref[pl.ds(p, 1)] = nz[None]


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _traverse_packets(node_pack, tri_pack, o_pk, d_pk, tlim_pk,
                      t_min=1e-3, interpret=False):
    g = o_pk.shape[0]

    def launch(args):
        o_c, d_c, t_c = args
        gc = o_c.shape[0]
        return pl.pallas_call(
            _make_kernel(t_min, gc),
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
    assert bvh4.stack_depth <= STACK_CAP, (
        f"BVH4 stack bound {bvh4.stack_depth} exceeds kernel capacity {STACK_CAP}")
    node_pack, tri_pack = _pack_tables(bvh4, fmat)
    t_pk, id_pk, m_pk, nx_pk, ny_pk, nz_pk = _traverse_packets(
        node_pack, tri_pack, o_pk, d_pk, tlim, t_min=t_min, interpret=interpret,
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
