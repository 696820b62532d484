"""Pallas packet-traversal kernel — the speed-of-light tracing core.

Why this exists: on TPU, XLA lowers every gather (and any other
non-fusible op) to a separate kernel thunk with a large fixed launch
cost; a BVH traversal loop issues several per step, which measured
~0.6-0.75 ms *per traversal step* regardless of batch size. This kernel
collapses the entire wavefront-vs-BVH query into ONE launch:

  * the whole BVH4 (child bounds [N4,4,6], child codes [N4,4]) and the
    sorted triangle table ([T,9] packed v0/e1/e2 + [T] prim ids) are
    VMEM-resident for the whole grid (≈4.5 MB for the 82k-tri scene),
  * the grid runs one program per ray PACKET of 8×128 = 1024 rays
    (pre-sorted by direction octant + origin Morton for coherence —
    ops/packets._coherence_keys); each program walks its own scalar
    node stack (SMEM) and tests child boxes / leaf triangles with full
    (8,128)-tile VPU ops broadcast from (1,1) scalar slices,
  * a packet descends into a child iff ANY of its rays hits the child
    box; per-ray t_best keeps closest-hit exact (same slab +
    Möller–Trumbore semantics as ops/bvh4.py, equivalence-tested).

Layout notes: rays enter as [G, 3, 8, 128] planes (x/y/z sublane-tiled),
t limits as [G, 8, 128]; outputs are per-ray t and ORIGINAL face ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.bvh4 import MAX_LEAF, Bvh4

BIG = np.float32(3.0e38)
P_SUB, P_LANE = 8, 128
PACKET = P_SUB * P_LANE  # 1024 rays per program
NONE = np.int32(-1)
STACK_CAP = 256  # SMEM entries (1 KB); build asserts stack_depth <= this
# Packets per kernel launch: bounds the launch's VMEM output staging.
MAX_PACKETS_PER_CALL = 128


def _make_kernel(t_min: float, n_packets: int):
    """Single-invocation kernel: loops over all `n_packets` packets with a
    fori_loop (no Pallas grid — grid pipelining double-buffers the
    VMEM-resident BVH tables per step and blows the VMEM budget)."""

    def kernel(bounds_ref, children_ref, tri_ref, prim_ref, fmat_ref,
               o_ref, d_ref, tlim_ref,
               t_out_ref, id_out_ref, mat_out_ref, nx_out_ref, ny_out_ref, nz_out_ref):
        def body_scoped(stack_ref):
            def per_packet(p, _):
                _kernel_body(t_min, p, bounds_ref, children_ref, tri_ref, prim_ref,
                             fmat_ref, o_ref, d_ref, tlim_ref,
                             t_out_ref, id_out_ref, mat_out_ref,
                             nx_out_ref, ny_out_ref, nz_out_ref, stack_ref)
                return 0

            jax.lax.fori_loop(0, n_packets, per_packet, 0)

        pl.run_scoped(body_scoped, pltpu.SMEM((STACK_CAP,), jnp.int32))

    return kernel


def _kernel_body(t_min, p, bounds_ref, children_ref, tri_ref, prim_ref, fmat_ref,
                 o_ref, d_ref, tlim_ref,
                 t_out_ref, id_out_ref, mat_out_ref, nx_out_ref, ny_out_ref, nz_out_ref,
                 stack_ref):
    # All tables arrive FLATTENED to [-1, 128] (lane-aligned): natural
    # [T, 9]/[T, 1] layouts get lane-padded to 128 columns in VMEM
    # (observed 40 MB for a 3 MB table), so elements are fetched with
    # scalar loads at computed flat offsets instead.
    def fl_f(ref, idx):
        return ref[idx // P_LANE, idx % P_LANE]

    n_tris = (prim_ref.shape[0] * P_LANE)  # padded bound; true T <= this
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

    # Root box = union of the root node's child boxes (flat reads of
    # node 0's 4x6 floats; empty slots hold +inf/-inf).
    rb = [[fl_f(bounds_ref, jnp.int32(k * 6 + j)) for j in range(6)] for k in range(4)]
    finite = [rb[k][3] > -BIG for k in range(4)]
    neg = jnp.float32(-BIG)
    rlo_x = jnp.minimum(jnp.minimum(rb[0][0], rb[1][0]), jnp.minimum(rb[2][0], rb[3][0]))
    rlo_y = jnp.minimum(jnp.minimum(rb[0][1], rb[1][1]), jnp.minimum(rb[2][1], rb[3][1]))
    rlo_z = jnp.minimum(jnp.minimum(rb[0][2], rb[1][2]), jnp.minimum(rb[2][2], rb[3][2]))

    def fmax4(vals):
        return jnp.maximum(jnp.maximum(vals[0], vals[1]), jnp.maximum(vals[2], vals[3]))

    rhi_x = fmax4([jnp.where(finite[k], rb[k][3], neg) for k in range(4)])
    rhi_y = fmax4([jnp.where(finite[k], rb[k][4], neg) for k in range(4)])
    rhi_z = fmax4([jnp.where(finite[k], rb[k][5], neg) for k in range(4)])

    def slab(lx, ly, lz, hx, hy, hz, t_best):
        t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
        t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
        t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        return tmax > tmin, tmin

    rhit, _ = slab(rlo_x, rlo_y, rlo_z, rhi_x, rhi_y, rhi_z, t_best0)
    start = jnp.where(jnp.any(rhit), 0, NONE)

    def cond(carry):
        return carry[0] != NONE

    def body(carry):
        task, sp, t_best, best, mat, nx, ny, nz = carry
        is_internal = task >= 0

        # ---------- Internal node ----------
        ni = jnp.where(is_internal, task, 0)
        nb_base = ni * 24
        nch = [fl_f(children_ref, ni * 4 + k) for k in range(4)]

        # Per-child packet test: any-ray-hit and packet-min entry t.
        tmins = []
        for k in range(4):
            b6 = [fl_f(bounds_ref, nb_base + k * 6 + j) for j in range(6)]
            hk, tk = slab(b6[0], b6[1], b6[2], b6[3], b6[4], b6[5], t_best)
            valid = is_internal & (nch[k] != NONE)
            any_k = jnp.any(hk) & valid
            tmins.append(jnp.where(any_k, jnp.min(jnp.where(hk, tk, BIG)), BIG))

        # Scalar 4-sort by entry t.
        tm = list(tmins)
        cc = list(nch)
        for (i, j) in ((0, 2), (1, 3), (0, 1), (2, 3), (1, 2)):
            swap = tm[i] > tm[j]
            tm[i], tm[j] = (jnp.where(swap, tm[j], tm[i]), jnp.where(swap, tm[i], tm[j]))
            cc[i], cc[j] = (jnp.where(swap, cc[j], cc[i]), jnp.where(swap, cc[i], cc[j]))
        nhit = (
            (tm[0] < BIG).astype(jnp.int32)
            + (tm[1] < BIG).astype(jnp.int32)
            + (tm[2] < BIG).astype(jnp.int32)
            + (tm[3] < BIG).astype(jnp.int32)
        )

        # Push far-to-near (so nearer pops first); descend nearest.
        new_sp = sp
        for k in (3, 2, 1):
            do_push = is_internal & (nhit > k)

            @pl.when(do_push)
            def _(k=k, s=new_sp):
                stack_ref[s] = cc[k]

            new_sp = jnp.where(do_push, new_sp + 1, new_sp)
        desc = jnp.where(is_internal & (nhit > 0), cc[0], NONE)

        # ---------- Leaf range ----------
        code = jnp.where(task <= -2, -task - 2, 0)
        leaf_lo = code // 8
        leaf_count = code % 8 + 1
        is_leaf = task <= -2
        for k in range(MAX_LEAF):
            # Clamp: for k >= leaf_count the load is masked out but must
            # stay inside the (padded) flat table.
            slot = jnp.minimum(leaf_lo + k, n_tris - 1)
            tb = slot * 9
            v0x, v0y, v0z = fl_f(tri_ref, tb), fl_f(tri_ref, tb + 1), fl_f(tri_ref, tb + 2)
            e1x, e1y, e1z = fl_f(tri_ref, tb + 3), fl_f(tri_ref, tb + 4), fl_f(tri_ref, tb + 5)
            e2x, e2y, e2z = fl_f(tri_ref, tb + 6), fl_f(tri_ref, tb + 7), fl_f(tri_ref, tb + 8)
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
            ok &= is_leaf & (k < leaf_count)
            t_best = jnp.where(ok, t, t_best)
            best = jnp.where(ok, fl_f(prim_ref, slot), best)
            mat = jnp.where(ok, fl_f(fmat_ref, slot), mat)
            # Geometric (unnormalized) face normal of the winning
            # triangle — normalized outside (reference Core/Mesh.cuh:303).
            nx = jnp.where(ok, e1y * e2z - e1z * e2y, nx)
            ny = jnp.where(ok, e1z * e2x - e1x * e2z, ny)
            nz = jnp.where(ok, e1x * e2y - e1y * e2x, nz)

        # ---------- Next task ----------
        next_task = jnp.where(is_internal, desc, NONE)
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
def _traverse_packets(bounds, children, tri, prim, fmat, o_pk, d_pk, tlim_pk,
                      t_min=1e-3, interpret=False):
    g = o_pk.shape[0]

    def launch(args):
        o_c, d_c, t_c = args
        gc = o_c.shape[0]
        return pl.pallas_call(
            _make_kernel(t_min, gc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
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
        )(bounds, children, tri, prim, fmat, o_c, d_c, t_c)

    def flat128(arr):
        f = arr.reshape(-1)
        padl = (-f.shape[0]) % P_LANE
        if padl:
            f = jnp.concatenate([f, jnp.zeros((padl,), f.dtype)])
        return f.reshape(-1, P_LANE)

    bounds = flat128(bounds)
    children = flat128(children)
    tri = flat128(tri)
    prim = flat128(prim)
    fmat = flat128(fmat)

    if g <= MAX_PACKETS_PER_CALL:
        return launch((o_pk, d_pk, tlim_pk))

    # Big wavefronts: map over fixed-size packet chunks so the launch's
    # staging stays well inside VMEM (pad the last chunk).
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
    mat_id, normal (unnormalized geometric cross(e1,e2)) — all [N].
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
    t_pk, id_pk, m_pk, nx_pk, ny_pk, nz_pk = _traverse_packets(
        bvh4.bounds, bvh4.children, bvh4.tri, bvh4.prim_index, fmat,
        o_pk, d_pk, tlim, t_min=t_min, interpret=interpret,
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
