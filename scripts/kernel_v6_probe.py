"""Kernel v6 prototype probe: DUAL-UNIT sub-warp traversal, verified
exactly against the production v5 kernel and timed head-to-head.

v6 changes vs ops/pallas_traverse._kernel_body (v5):

1. ROW-PER-NODE table: node n occupies row n (lanes 0:24 child bounds,
   24:28 float-encoded child codes). Kills the 4-way _select_record
   chain and the task//4 / task%4 fetch math. Costs VMEM (512 B/node,
   ~3.7 MB for the bunny tree) — affordable at the 64 MB limit.
2. LEAF CODES ARE TRI-TABLE ROW IDS: child code <= -2 -> tri row
   (-code-2). One leaf == one row already (align_leaves_to_rows), so
   the count nibble is dead weight; dropping it simplifies decisions.
3. DUAL UNITS per chain per iteration: the INTERNAL unit expands one
   node from the int-only stack while the LEAF unit sweeps one tri row
   from a leaf-row stack. Today a leaf visit burns a whole iteration
   whose slab phase is garbage; with split stacks iterations/sub-warp
   drop 64 -> ~45 on bounce rays (scripts/dual_unit_study.py) at the
   same chain-visit count.
4. VECTORIZED DECISIONS: child hit masks, keys, and BOTH kind-split
   sort4 networks run on (8,4) vector tiles (one op for all 8 chains);
   the scalar phase shrinks to extracts of the sorted codes + stack
   pushes (scalar ops ~ Mosaic's real cost unit: ~1 ns/op, extracts
   ~3 ns — see scalar-cost analysis in ROADMAP).

Usage: python scripts/kernel_v6_probe.py [n_packets]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.bvh4 import Bvh4
from raytracer_tpu.ops.pallas_traverse import (
    BIG, HALF_BIG, NONE, P_LANE, P_SUB, TRI_STRIDE, trace_closest_pallas)

N_PACKETS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IDLE = np.int32(-1)  # leaf-unit idle marker (reads the zero row)


def pack_tables_v6(bvh4: Bvh4, fmat: jnp.ndarray):
    """Row-per-node node table + the v5 triangle table (8 records/row,
    leaf-row aligned, brute rows appended, trailing zero row).

    Node row n: lanes 0:24 = per-child (min xyz, max xyz); 24:28 =
    float-encoded child codes (internal -> CHILD NODE ROW id; leaf ->
    -(2 + tri_row); empty -> -1); rest zero."""
    n4 = np.asarray(bvh4.bounds).shape[0]
    t = np.asarray(bvh4.tri).shape[0]
    assert t % 8 == 0

    # --- tri table (identical layout to v5) ---
    def pack_rows(tri9, prim, mat):
        tri9 = np.asarray(tri9)
        tt = tri9.shape[0]
        vals = np.concatenate(
            [tri9, np.asarray(prim, np.float32)[:, None],
             np.asarray(mat, np.float32)[:, None],
             np.zeros((tt, TRI_STRIDE - 11), np.float32)], axis=1)
        return vals.reshape(-1, 8 * TRI_STRIDE)

    tri_pack = pack_rows(bvh4.tri, bvh4.prim_index, fmat)
    n_leaf_rows = tri_pack.shape[0]
    if bvh4.brute_tri is not None:
        tri_pack = np.concatenate(
            [tri_pack,
             pack_rows(bvh4.brute_tri, bvh4.brute_prim, bvh4.brute_mat)])
    n_brute_rows = tri_pack.shape[0] - n_leaf_rows
    tri_pack = np.concatenate(
        [tri_pack, np.zeros((1, 8 * TRI_STRIDE), np.float32)])

    # --- node table: row per node, leaf codes remapped to tri rows ---
    ch = np.asarray(bvh4.children).astype(np.int64).copy()
    leaf = ch <= -2
    code = -ch[leaf] - 2
    ch[leaf] = -(2 + code // 64)  # tri row id (leaf ranges are 8-aligned)
    assert n4 < (1 << 24) and tri_pack.shape[0] < (1 << 24)
    node_vals = np.concatenate(
        [np.asarray(bvh4.bounds).reshape(n4, 24),
         ch.astype(np.float32),
         np.zeros((n4, 128 - 28), np.float32)], axis=1)
    return (jnp.asarray(node_vals), jnp.asarray(tri_pack),
            n_leaf_rows, n_brute_rows)


def _make_kernel_v6(t_min, n_packets, stack_cap, zero_row, brute_rows,
                    max_iters):
    def kernel(node_ref, tri_ref, o_ref, d_ref, tlim_ref,
               t_out_ref, id_out_ref, mat_out_ref,
               nx_out_ref, ny_out_ref, nz_out_ref):
        def body_scoped(ntask_ref, sp_ref, ltask_ref, lsp_ref,
                        stack_ref, lstack_ref):
            def per_packet(p, _):
                _kernel_body_v6(
                    t_min, stack_cap, zero_row, brute_rows, max_iters, p,
                    node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                    t_out_ref, id_out_ref, mat_out_ref,
                    nx_out_ref, ny_out_ref, nz_out_ref,
                    ntask_ref, sp_ref, ltask_ref, lsp_ref,
                    stack_ref, lstack_ref)
                return 0

            jax.lax.fori_loop(0, n_packets, per_packet, 0)

        pl.run_scoped(body_scoped,
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB * stack_cap,), jnp.int32),
                      pltpu.SMEM((P_SUB * stack_cap,), jnp.int32))

    return kernel


def _kernel_body_v6(t_min, stack_cap, zero_row, brute_rows, max_iters, p,
                    node_ref, tri_ref, o_ref, d_ref, tlim_ref,
                    t_out_ref, id_out_ref, mat_out_ref,
                    nx_out_ref, ny_out_ref, nz_out_ref,
                    ntask_ref, sp_ref, ltask_ref, lsp_ref,
                    stack_ref, lstack_ref):
    o_pk = o_ref[pl.ds(p, 1)][0]
    d_pk = d_ref[pl.ds(p, 1)][0]
    ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]
    dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
    ix = 1.0 / dx
    iy = 1.0 / dy
    iz = 1.0 / dz

    t_best0 = tlim_ref[pl.ds(p, 1)][0]
    best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
    mat0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
    n0 = jnp.zeros((P_SUB, P_LANE), jnp.float32)

    def slab(lx, ly, lz, hx, hy, hz, t_best):
        t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
        t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
        t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        return tmax > tmin, tmin

    def mt_record(fields, prim, matid, state):
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
        nx = jnp.where(ok, e1y * e2z - e1z * e2y, nx)
        ny = jnp.where(ok, e1z * e2x - e1x * e2z, ny)
        nz = jnp.where(ok, e1x * e2y - e1y * e2x, nz)
        return t_best, best, mat, nx, ny, nz

    def mt_row8(trow8, state):
        for k in range(8):
            trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
            ids = trec[:, 9:11].astype(jnp.int32)
            state = mt_record(tuple(trec[:, c:c + 1] for c in range(9)),
                              ids[:, 0:1], ids[:, 1:2], state)
        return state

    # Brute pre-pass (two-level split) — identical to v5.
    state0 = (t_best0, best0, mat0, n0, n0, n0)
    for r in brute_rows:
        row = tri_ref[r:r + 1]
        state0 = mt_row8(jnp.concatenate([row] * P_SUB, axis=0), state0)
    t_best0, best0, mat0, n0x, n0y, n0z = state0

    # Root test from node row 0 (whole-tree box = union of root's children).
    rec0 = node_ref[0:1, 0:24]
    neg = jnp.float32(-BIG)

    def bval0(k, j):
        return rec0[0, k * 6 + j]

    finite = [bval0(k, 3) > -BIG for k in range(4)]

    def min4(j):
        return jnp.minimum(jnp.minimum(bval0(0, j), bval0(1, j)),
                           jnp.minimum(bval0(2, j), bval0(3, j)))

    def max4(j):
        vals = [jnp.where(finite[k], bval0(k, j), neg) for k in range(4)]
        return jnp.maximum(jnp.maximum(vals[0], vals[1]),
                           jnp.maximum(vals[2], vals[3]))

    rhit, _ = slab(min4(0), min4(1), min4(2), max4(3), max4(4), max4(5), t_best0)
    alive_cnt = jnp.sum(rhit.astype(jnp.int32), axis=1, keepdims=True)

    n_alive0 = jnp.int32(0)
    for s in range(P_SUB):
        t0s = jnp.where(alive_cnt[s, 0] > 0, jnp.int32(0), NONE)
        ntask_ref[s] = t0s
        sp_ref[s] = jnp.int32(0)
        ltask_ref[s] = IDLE
        lsp_ref[s] = jnp.int32(0)
        n_alive0 += (t0s != NONE).astype(jnp.int32)

    def cond(carry):
        return (carry[0] > 0) & (carry[1] > 0)

    def body(carry):
        iters_left, n_alive, t_best, best, mat, nx, ny, nz = carry

        # ---- Fetch: one node row (internal unit) + one tri row (leaf
        # unit) per chain. Row ids ARE the tasks (row-per-node).
        nrows, trows, ntasks, ltasks = [], [], [], []
        for s in range(P_SUB):
            nt = ntask_ref[s]
            lt = ltask_ref[s]
            ntasks.append(nt)
            ltasks.append(lt)
            nrow = node_ref[pl.ds(jnp.where(nt >= 0, nt, 0), 1)]
            nrows.append(nrow[:, 0:32])
            trows.append(tri_ref[pl.ds(jnp.where(lt >= 0, lt, zero_row), 1)])
        nrec8 = jnp.concatenate(nrows, axis=0)       # (8,32)
        trow8 = jnp.concatenate(trows, axis=0)       # (8,128)
        ch8 = nrec8[:, 24:28].astype(jnp.int32)      # (8,4)

        # ---- Leaf unit: sweep the tri row (idle chains read zero row).
        t_best, best, mat, nx, ny, nz = mt_row8(
            trow8, (t_best, best, mat, nx, ny, nz))

        # ---- Internal unit: 4 child slabs.
        def bcol(k, j):
            c = k * 6 + j
            return nrec8[:, c:c + 1]

        hks, reps = [], []
        for k in range(4):
            hk, tk = slab(bcol(k, 0), bcol(k, 1), bcol(k, 2),
                          bcol(k, 3), bcol(k, 4), bcol(k, 5), t_best)
            hks.append(hk)
            reps.append(jnp.where(hk, tk, HALF_BIG)[:, 0:1])
        pa = jnp.sum(hks[0].astype(jnp.int32) + (hks[1].astype(jnp.int32) << 16),
                     axis=1, keepdims=True)
        pb = jnp.sum(hks[2].astype(jnp.int32) + (hks[3].astype(jnp.int32) << 16),
                     axis=1, keepdims=True)

        # ---- Vector decision prep (all 8 chains at once, (8,4) tiles).
        anyk = jnp.concatenate(
            [pa & 0xFFFF, pa >> 16, pb & 0xFFFF, pb >> 16], axis=1) > 0
        valid = anyk & (ch8 != NONE)
        rep4 = jnp.concatenate(reps, axis=1)          # (8,4)
        is_leaf4 = ch8 <= -2
        k_int = jnp.where(valid & ~is_leaf4, rep4, BIG)
        k_leaf = jnp.where(valid & is_leaf4, rep4, BIG)

        def vsort4(keys, codes):
            kc = [keys[:, k:k + 1] for k in range(4)]
            cc = [codes[:, k:k + 1] for k in range(4)]
            for (i, j) in ((0, 2), (1, 3), (0, 1), (2, 3), (1, 2)):
                sw = kc[i] > kc[j]
                kc[i], kc[j] = (jnp.where(sw, kc[j], kc[i]),
                                jnp.where(sw, kc[i], kc[j]))
                cc[i], cc[j] = (jnp.where(sw, cc[j], cc[i]),
                                jnp.where(sw, cc[i], cc[j]))
            return kc, cc

        ki, ci = vsort4(k_int, ch8)      # internal children by entry t
        kl, cl = vsort4(k_leaf, ch8)     # leaf children by entry t
        n_int = ((ki[0] < BIG).astype(jnp.int32) + (ki[1] < BIG).astype(jnp.int32)
                 + (ki[2] < BIG).astype(jnp.int32) + (ki[3] < BIG).astype(jnp.int32))
        n_leaf = ((kl[0] < BIG).astype(jnp.int32) + (kl[1] < BIG).astype(jnp.int32)
                  + (kl[2] < BIG).astype(jnp.int32) + (kl[3] < BIG).astype(jnp.int32))

        # ---- Scalar phase per chain.
        new_alive = jnp.int32(0)
        for s in range(P_SUB):
            nt = ntasks[s]
            is_int = nt >= 0
            sp = sp_ref[s]
            lsp = lsp_ref[s]
            # STALL guard: if the leaf stack is nearly full, the internal
            # unit re-schedules this node (drops this expansion, repeats
            # it next iteration) while the leaf unit keeps draining —
            # bounds lstack soundly without a growable queue.
            stall = lsp >= stack_cap - 8
            nh_i = jnp.where(is_int & ~stall, n_int[s, 0], 0)
            nh_l = jnp.where(is_int & ~stall, n_leaf[s, 0], 0)

            # Internal pushes: far-to-near (branchless clamped stores,
            # same scheme as v5 — non-pushed ks die below the new top).
            base_i = s * stack_cap
            for k in (3, 2, 1):
                stack_ref[base_i + sp + jnp.maximum(nh_i - 1 - k, 0)] = ci[k][s, 0]
            new_sp = jnp.minimum(sp + jnp.maximum(nh_i - 1, 0), stack_cap - 4)
            desc = jnp.where(nh_i > 0, ci[0][s, 0], NONE)
            do_pop = ~stall & (desc == NONE) & (new_sp > 0) & (nt != NONE)
            popped = stack_ref[base_i + jnp.maximum(new_sp - 1, 0)]
            nxt = jnp.where(stall, nt, jnp.where(do_pop, popped, desc))
            ntask_ref[s] = nxt
            sp_ref[s] = jnp.where(do_pop, new_sp - 1, new_sp)

            # Leaf unit: hit leaf children feed the leaf stack; the
            # nearest goes straight to next iteration's sweep slot.
            lsp = lsp_ref[s]
            for k in (3, 2, 1):
                lstack_ref[base_i + lsp + jnp.maximum(nh_l - 1 - k, 0)] = (
                    -cl[k][s, 0] - 2)
            new_lsp = jnp.minimum(lsp + jnp.maximum(nh_l - 1, 0), stack_cap - 4)
            lt_new = jnp.where(nh_l > 0, -cl[0][s, 0] - 2, IDLE)
            l_pop = (lt_new == IDLE) & (new_lsp > 0)
            l_popped = lstack_ref[base_i + jnp.maximum(new_lsp - 1, 0)]
            lt_new = jnp.where(l_pop, l_popped, lt_new)
            ltask_ref[s] = lt_new
            lsp_ref[s] = jnp.where(l_pop, new_lsp - 1, new_lsp)

            new_alive += ((nxt != NONE) | (lt_new != IDLE)).astype(jnp.int32)

        return iters_left - 1, new_alive, t_best, best, mat, nx, ny, nz

    _, _, t_best, best, mat, nx, ny, nz = jax.lax.while_loop(
        cond, body,
        (jnp.int32(max_iters), n_alive0, t_best0, best0, mat0, n0x, n0y, n0z))
    t_out_ref[pl.ds(p, 1)] = t_best[None]
    id_out_ref[pl.ds(p, 1)] = best[None]
    mat_out_ref[pl.ds(p, 1)] = mat[None]
    nx_out_ref[pl.ds(p, 1)] = nx[None]
    ny_out_ref[pl.ds(p, 1)] = ny[None]
    nz_out_ref[pl.ds(p, 1)] = nz[None]


@functools.partial(jax.jit, static_argnames=("t_min", "stack_cap",
                                              "n_brute_rows", "interpret"))
def traverse_v6(node_pack, tri_pack, o_pk, d_pk, tlim_pk, t_min=1e-3,
                stack_cap=64, n_brute_rows=0, interpret=False):
    g = o_pk.shape[0]
    zero_row = tri_pack.shape[0] - 1
    brute_rows = tuple(range(zero_row - n_brute_rows, zero_row))
    max_iters = node_pack.shape[0] + (zero_row - n_brute_rows) + 8
    return pl.pallas_call(
        _make_kernel_v6(t_min, g, stack_cap, zero_row, brute_rows, max_iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, P_SUB, P_LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(node_pack, tri_pack, o_pk, d_pk, tlim_pk)


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    from raytracer_tpu.scene.builder import reference_scene

    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    scene = reference_scene(assets_dir=os.path.join(
        os.path.dirname(__file__), "..", "assets", "models"), build_bvh=True)
    b4 = scene.bvh4
    fmat = b4.face_mat

    rng = np.random.default_rng(0)
    n = N_PACKETS * 1024
    o = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = (dd / np.linalg.norm(dd, axis=1, keepdims=True)).astype(np.float32)

    # --- Reference result: production v5 kernel path. ---
    t0 = time.perf_counter()
    ref = trace_closest_pallas(jnp.asarray(o), jnp.asarray(d), b4, BIG,
                               sort=False, interpret=interpret)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    print(f"v5 first call (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)

    # --- v6. ---
    node_pack, tri_pack, _, n_brute = pack_tables_v6(b4, fmat)
    node_pack, tri_pack = jax.block_until_ready((node_pack, tri_pack))
    o_pk = jnp.asarray(o).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    d_pk = jnp.asarray(d).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    tlim = jnp.full((N_PACKETS, P_SUB, P_LANE), BIG, jnp.float32)
    stack_cap = b4.stack_depth + 4

    t0 = time.perf_counter()
    outs = traverse_v6(node_pack, tri_pack, o_pk, d_pk, tlim,
                       stack_cap=stack_cap, n_brute_rows=n_brute,
                       interpret=interpret)
    outs = [np.asarray(x) for x in outs]
    print(f"v6 first call (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t_v6 = outs[0].reshape(-1)
    id_v6 = outs[1].reshape(-1)
    mat_v6 = outs[2].reshape(-1)
    found = id_v6 >= 0
    t_cmp = np.where(found, t_v6, BIG)
    id_cmp = np.where(found, id_v6, 0)
    mat_cmp = np.where(found, mat_v6, 0)

    bad_t = (~np.isclose(t_cmp, ref["t"], rtol=1e-5)).sum()
    bad_id = (id_cmp != ref["tri_id"]).sum()
    bad_m = (mat_cmp != ref["mat_id"]).sum()
    bad_h = (found != ref["hit"]).sum()
    print(f"mismatches: t={bad_t} tri={bad_id} mat={bad_m} hit={bad_h} "
          f"(n={n}, hits={found.sum()})", flush=True)

    if interpret:
        return

    # --- Timing head-to-head (device_get sync). ---
    def time_v5():
        best = 1e9
        for i in range(3):
            oj = jnp.asarray(o + rng.normal(scale=1e-6, size=o.shape
                                            ).astype(np.float32))
            jax.block_until_ready(oj)
            t0 = time.perf_counter()
            r = trace_closest_pallas(oj, jnp.asarray(d), b4, BIG, sort=False)
            float(np.asarray(r["t"])[0])
            best = min(best, time.perf_counter() - t0)
        return best

    def time_v6():
        best = 1e9
        for i in range(3):
            oj = o + rng.normal(scale=1e-6, size=o.shape).astype(np.float32)
            op = jnp.asarray(oj).reshape(N_PACKETS, 1024, 3).transpose(
                0, 2, 1).reshape(N_PACKETS, 3, P_SUB, P_LANE)
            jax.block_until_ready(op)
            t0 = time.perf_counter()
            r = traverse_v6(node_pack, tri_pack, op, d_pk, tlim,
                            stack_cap=stack_cap, n_brute_rows=n_brute)
            float(np.asarray(r[0])[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    tv5 = time_v5()
    tv6 = time_v6()
    print(f"v5: {tv5*1e3:7.1f} ms  ({tv5/N_PACKETS*1e6:6.1f} us/packet)",
          flush=True)
    print(f"v6: {tv6*1e3:7.1f} ms  ({tv6/N_PACKETS*1e6:6.1f} us/packet)  "
          f"speedup x{tv5/tv6:.2f}", flush=True)


if __name__ == "__main__":
    main()
