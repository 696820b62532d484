"""G-tile MERGED traversal — the interleave (G=2) experiment, quarantined
out of the production kernel file (round-5 diet; VERDICT r4).

Round-4 verdict on this path: per-tile cond-gated steps compile and are
equality-tested, but the 2K frame measured 9.07 s vs 8.22 s for G=1 —
the stateless probe's ~15% latency win (kernel_interleave_probe.py)
does not survive the ~30 live path-state carries of the merged path
loop spilling. Kept default-off behind RAYTRACER_TPU_INTERLEAVE=2 for
re-evaluation whenever the loop body gets leaner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from raytracer_tpu.ops.pallas_traverse import (
    BIG, EMPTY16, NONE, P_LANE, P_SUB, SPARE_HIGH, SPARE_NONE, TRI_STRIDE)


def traverse_tiles(t_min, stack_cap, zero_row, max_iters, n_children,
                   brute_trows, root_lo, root_hi, node_ref, tri_ref,
                   rays,
                   ntask_ref, sp_ref, ltask_ref, lsp_ref,
                   stack_ref, lstack_ref, ispare_ref, lspare_ref):
    """G-TILE MERGED traversal: trace G independent (8,128) ray tiles in
    ONE while loop (G*P_SUB chains; SMEM refs sized G*P_SUB[*stack_cap]).

    WHY: the single-tile loop body is a serialized latency chain
    (SMEM task → dynamic row load → vector reduce → scalar decide →
    SMEM write); KERNEL_STATS_r04 fits it at 1.41 us/iteration vs a
    1.07 us op floor. Independent tiles' chains interleave under that
    latency (scripts/kernel_interleave_probe.py: ~15% at G=2). Unlike
    naive packet-pairing, a tile whose chains have ALL gone idle skips
    its fetch/leaf/slab/sort phases via lax.cond each iteration (the
    proven LEAF_COND pattern — vector phases are pure, the branchless
    scalar phase self-no-ops on idle chains), so the merged loop's
    extra iterations on the longer tile cost only the idle tile's
    scalar-phase slots — no max-of-2G lockstep widening.

    `rays` = G tuples (ox, oy, oz, dx, dy, dz, t_lim); returns a list of
    G (t_best, best, mat, nx, ny, nz) tuples. Traversal order and
    results per tile are IDENTICAL to traverse_tile (the per-chain
    decision stream only depends on that chain's state).
    Single-leaf-row mode only."""
    G = len(rays)
    K = n_children

    from raytracer_tpu.ops.bvh4 import SORT_PAIRS

    def make_geom(r):
        ox, oy, oz, dx, dy, dz, t_lim = r
        return (ox, oy, oz, dx, dy, dz, 1.0 / dx, 1.0 / dy, 1.0 / dz, t_lim)

    def slab_g(geom, lx, ly, lz, hx, hy, hz, t_best):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, _ = geom
        t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
        t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
        t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        return tmax > tmin, tmin

    def mt_record_g(geom, fields, prim, matid, state):
        ox, oy, oz, dx, dy, dz, _, _, _, _ = geom
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

    geoms = [make_geom(r) for r in rays]
    best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
    i0_ = jnp.zeros((P_SUB, P_LANE), jnp.int32)
    f0_ = jnp.zeros((P_SUB, P_LANE), jnp.float32)

    # Per-tile brute pre-pass + root test + chain init.
    states = []
    n_alives0 = []
    for g in range(G):
        geom = geoms[g]
        st = (geom[9], best0, i0_, f0_, f0_, f0_)
        for trow in brute_trows:
            for k in range(8):
                trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                ids = trec[:, 9:11].astype(jnp.int32)
                st = mt_record_g(geom, tuple(trec[:, c:c + 1] for c in range(9)),
                                 ids[:, 0:1], ids[:, 1:2], st)
        rhit, _ = slab_g(geom, root_lo[0], root_lo[1], root_lo[2],
                         root_hi[0], root_hi[1], root_hi[2], st[0])
        alive_cnt = jnp.sum(rhit.astype(jnp.int32), axis=1, keepdims=True)
        na = jnp.int32(0)
        for s in range(P_SUB):
            c = g * P_SUB + s
            t0s = jnp.where(alive_cnt[s, 0] > 0, jnp.int32(0), NONE)
            ntask_ref[c] = t0s
            sp_ref[c] = jnp.int32(0)
            ltask_ref[c] = NONE
            lsp_ref[c] = jnp.int32(0)
            ispare_ref[c] = SPARE_NONE
            lspare_ref[c] = SPARE_NONE
            na += (t0s != NONE).astype(jnp.int32)
        states.append(st)
        n_alives0.append(na)

    n_pairs = K // 2
    empty_col = jnp.full((P_SUB, 1), EMPTY16, jnp.int32)
    zero_col_i = jnp.zeros((P_SUB, 1), jnp.int32)
    none_col = jnp.full((P_SUB, 1), NONE, jnp.int32)

    def low16(x):
        return jnp.bitwise_and(x, EMPTY16)

    def consume(x):
        return jnp.bitwise_or(
            jnp.bitwise_and(jnp.right_shift(x, 16), EMPTY16), SPARE_HIGH)

    # Static trip bound: per tile, visits ≤ nodes + leaf rows (same
    # argument as traverse_tile); the merged loop runs max over tiles.
    def cond(carry):
        alive_any = carry[1]
        for g in range(1, G):
            alive_any = alive_any + carry[1 + g]
        return (carry[0] > 0) & (alive_any > 0)

    def body(carry):
        iters_left = carry[0]
        n_alive = list(carry[1:1 + G])
        states = [tuple(carry[1 + G + 6 * g + j] for j in range(6))
                  for g in range(G)]

        new_states = []
        decisions = []
        for g in range(G):
            geom = geoms[g]
            base_c = g * P_SUB

            # ---- Per-tile vector step under ONE cond: fetch node rows,
            # leaf-row MT sweep, child slabs + kind-split sorts, pair
            # packing. Idle tiles (all chains done) skip the whole block
            # and return no-op decisions; their scalar phase below is
            # already a branchless no-op on NONE tasks.
            def tile_step(st, g=g, geom=geom, base_c=base_c):
                t_best, best, mat, nx, ny, nz = st
                nrecs, ltasks = [], []
                any_leaf = jnp.int32(0)
                for s in range(P_SUB):
                    nt = ntask_ref[base_c + s]
                    lt = ltask_ref[base_c + s]
                    ltasks.append(lt)
                    any_leaf += (lt != NONE).astype(jnp.int32)
                    nrow = node_ref[pl.ds(jnp.where(nt >= 0, nt, 0), 1)]
                    nrecs.append(nrow[:, 0:7 * K])
                nrec8 = jnp.concatenate(nrecs, axis=0)
                ch8 = nrec8[:, 6 * K:7 * K].astype(jnp.int32)

                def row_block(state):
                    trows = [tri_ref[pl.ds(jnp.where(ltasks[s] >= 0,
                                                     ltasks[s], zero_row), 1)]
                             for s in range(P_SUB)]
                    trow8 = jnp.concatenate(trows, axis=0)
                    for k in range(8):
                        trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                        ids = trec[:, 9:11].astype(jnp.int32)
                        state = mt_record_g(
                            geom, tuple(trec[:, c:c + 1] for c in range(9)),
                            ids[:, 0:1], ids[:, 1:2], state)
                    return state

                st6 = (t_best, best, mat, nx, ny, nz)
                st6 = jax.lax.cond(any_leaf > 0, row_block,
                                   lambda s_: s_, st6)
                t_best = st6[0]

                def bcol(k, j):
                    c = k * 6 + j
                    return nrec8[:, c:c + 1]

                hks, reps = [], []
                for k in range(K):
                    hk, tk = slab_g(geom, bcol(k, 0), bcol(k, 1), bcol(k, 2),
                                    bcol(k, 3), bcol(k, 4), bcol(k, 5), t_best)
                    hks.append(hk)
                    reps.append(jnp.min(jnp.where(hk, tk, BIG), axis=1,
                                        keepdims=True))
                packs = [jnp.sum(hks[i].astype(jnp.int32)
                                 + (hks[i + 1].astype(jnp.int32) << 16),
                                 axis=1, keepdims=True)
                         for i in range(0, K, 2)]
                anyk_cols = []
                for p2 in packs:
                    anyk_cols.extend([p2 & 0xFFFF, p2 >> 16])
                anyk = jnp.concatenate(anyk_cols, axis=1) > 0
                valid = anyk & (ch8 != NONE)
                rep4 = jnp.concatenate(reps, axis=1)
                is_leaf4 = ch8 <= -2
                k_int = jnp.where(valid & ~is_leaf4, rep4, BIG)
                k_leaf = jnp.where(valid & is_leaf4, rep4, BIG)

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

                ki, ci = vsortk(k_int, ch8)
                kl, cl = vsortk(k_leaf, ch8)
                n_int = (ki[0] < BIG).astype(jnp.int32)
                n_leaf = (kl[0] < BIG).astype(jnp.int32)
                for k in range(1, K):
                    n_int = n_int + (ki[k] < BIG).astype(jnp.int32)
                    n_leaf = n_leaf + (kl[k] < BIG).astype(jnp.int32)
                ci_e = [jnp.where(ki[k] < BIG, ci[k], EMPTY16)
                        for k in range(1, K)]
                ci_e.append(empty_col)
                cl_e = [jnp.where(kl[k] < BIG, -cl[k] - 2, EMPTY16)
                        for k in range(1, K)]
                cl_e.append(empty_col)
                pair_i = [jnp.bitwise_or(ci_e[2 * pe],
                                         jnp.left_shift(ci_e[2 * pe + 1], 16))
                          for pe in range(n_pairs)]
                pair_l = [jnp.bitwise_or(cl_e[2 * pe],
                                         jnp.left_shift(cl_e[2 * pe + 1], 16))
                          for pe in range(n_pairs)]
                desc0 = jnp.where(ki[0] < BIG, ci[0], NONE)
                lA = jnp.where(kl[0] < BIG, -cl[0] - 2, NONE)
                return (st6, (n_int, n_leaf, desc0, lA,
                              tuple(pair_i), tuple(pair_l)))

            def tile_idle(st, g=g):
                return (st, (zero_col_i, zero_col_i, none_col, none_col,
                             tuple(empty_col for _ in range(n_pairs)),
                             tuple(empty_col for _ in range(n_pairs))))

            st6, dec = jax.lax.cond(n_alive[g] > 0, tile_step, tile_idle,
                                    states[g])
            new_states.append(st6)
            decisions.append(dec)

        # ---- Scalar phase for ALL G*P_SUB chains (branchless; idle
        # chains no-op exactly as in traverse_tile).
        new_alive = [jnp.int32(0)] * G
        for g in range(G):
            n_int, n_leaf, desc0_col, lA_col, pair_i, pair_l = decisions[g]
            base_cg = g * P_SUB
            for s in range(P_SUB):
                c = base_cg + s
                nt = ntask_ref[c]
                is_int = nt >= 0
                sp = sp_ref[c]
                lsp = lsp_ref[c]
                stall = lsp >= stack_cap - 4 - K
                nh_i = jnp.where(is_int & ~stall, n_int[s, 0], 0)
                nh_l = jnp.where(is_int & ~stall, n_leaf[s, 0], 0)
                base = c * stack_cap

                spare = ispare_ref[c]
                has_spare = low16(spare) != EMPTY16
                ne = nh_i >> 1
                spare_push = has_spare & (ne > 0)
                stack_ref[base + sp] = spare
                sp_eff = sp + spare_push.astype(jnp.int32)
                for pe in range(n_pairs - 1, -1, -1):
                    stack_ref[base + sp_eff + jnp.maximum(ne - 1 - pe, 0)] = (
                        pair_i[pe][s, 0])
                new_sp = jnp.minimum(sp_eff + ne, stack_cap - 4)
                desc = jnp.where(nh_i > 0, desc0_col[s, 0], NONE)
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
                ispare_ref[c] = jnp.where(use_spare, consume(spare1),
                                jnp.where(do_pop, consume(popped), spare1))
                ntask_ref[c] = nxt
                sp_ref[c] = jnp.where(do_pop, new_sp - 1, new_sp)

                lspare = lspare_ref[c]
                l_has = low16(lspare) != EMPTY16
                nle = nh_l >> 1
                l_spush = l_has & (nle > 0)
                lstack_ref[base + lsp] = lspare
                lsp_eff = lsp + l_spush.astype(jnp.int32)
                for pe in range(n_pairs - 1, -1, -1):
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
                lspare_ref[c] = jnp.where(l_use, consume(lspare1),
                                jnp.where(l_pop, consume(l_popped), lspare1))
                ltask_ref[c] = ltA
                lsp_ref[c] = jnp.where(l_pop, new_lsp - 1, new_lsp)

                new_alive[g] = new_alive[g] + (
                    (nxt != NONE) | (ltA != NONE)).astype(jnp.int32)

        out = [iters_left - 1] + new_alive
        for st6 in new_states:
            out.extend(st6)
        return tuple(out)

    init = [jnp.int32(max_iters)] + n_alives0
    for st in states:
        init.extend(st)
    out = jax.lax.while_loop(cond, body, tuple(init))
    return [tuple(out[1 + G + 6 * g + j] for j in range(6))
            for g in range(G)]
