"""Per-iteration phase ablation of the CURRENT (round-5, BVH8 dual-unit
pair-packed) traversal body.

A fixed-iteration fori_loop copy of traverse_tile's per-iteration
phases runs with synthetic task streams (so every variant executes
identical iteration counts), knocking phases out one at a time:

  full      — everything (the production body shape)
  no_fetch  — node rows from a static row instead of 8 dynamic loads
  no_leaf   — leaf block (8 tri row loads + 8 MT records) removed
  no_slab   — 8 child slab tests replaced by constant masks/keys
  no_reduce — the 8 per-child rep-key min-reductions + 2 pack
              sum-reductions replaced by lane-0 columns
  no_sort   — the two kind-split sort-8 networks + pair packing skipped
  no_scalar — the per-chain scalar push/pop phase skipped

Prints µs/iteration per variant (floor-corrected); the deltas are the
phase costs of the REAL body at matched iteration counts. TPU-only.

Usage: python scripts/kernel_ablate_v8.py [iters] [packets]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.bvh4 import SORT_PAIRS
from raytracer_tpu.ops.pallas_traverse import (
    BIG, EMPTY16, NONE, P_LANE, P_SUB, SPARE_HIGH, SPARE_NONE, TRI_STRIDE)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
N_PACKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = 8
STACK_CAP = 68


def make_kernel(variant: str, n_nodes: int, n_trirows: int):
    fetch = variant != "no_fetch"
    leaf = variant != "no_leaf"
    slab_on = variant != "no_slab"
    reduce_on = variant != "no_reduce"
    sort_on = variant != "no_sort"
    scalar_on = variant != "no_scalar"

    def kernel(node_ref, tri_ref, o_ref, d_ref, t_out_ref):
        def scoped(ntask_ref, sp_ref, ltask_ref, lsp_ref,
                   stack_ref, lstack_ref, ispare_ref, lspare_ref):
            def per_packet(p, _):
                o_pk = o_ref[pl.ds(p, 1)][0]
                d_pk = d_ref[pl.ds(p, 1)][0]
                ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]
                dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
                ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

                for s in range(P_SUB):
                    ntask_ref[s] = jnp.int32(s)
                    sp_ref[s] = jnp.int32(0)
                    ltask_ref[s] = jnp.int32(s)
                    lsp_ref[s] = jnp.int32(0)
                    ispare_ref[s] = SPARE_NONE
                    lspare_ref[s] = SPARE_NONE

                def slab(lx, ly, lz, hx, hy, hz, t_best):
                    t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
                    t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
                    t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), 1e-3))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), t_best))
                    return tmax > tmin, tmin

                def mt_record(fields, prim, state):
                    t_best, best = state
                    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = fields
                    hx_ = dy * e2z - dz * e2y
                    hy_ = dz * e2x - dx * e2z
                    hz_ = dx * e2y - dy * e2x
                    a = e1x * hx_ + e1y * hy_ + e1z * hz_
                    ok = jnp.abs(a) >= 1e-8
                    f = 1.0 / jnp.where(ok, a, 1.0)
                    sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
                    u = f * (sx * hx_ + sy * hy_ + sz * hz_)
                    ok &= (u >= 0.0) & (u <= 1.0)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (dx * qx + dy * qy + dz * qz)
                    ok &= (v >= 0.0) & (u + v <= 1.0)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok &= (t >= 1e-3) & (t < t_best)
                    t_best = jnp.where(ok, t, t_best)
                    best = jnp.where(ok, prim, best)
                    return t_best, best

                def body(i, carry):
                    t_best, best = carry

                    # ---- fetch
                    ntasks, ltasks, nrecs = [], [], []
                    for s in range(P_SUB):
                        nt = ntask_ref[s]
                        lt = ltask_ref[s]
                        ntasks.append(nt)
                        ltasks.append(lt)
                        if fetch:
                            nrow = node_ref[pl.ds(jnp.where(nt >= 0, nt, 0), 1)]
                            nrecs.append(nrow[:, 0:7 * K])
                    if fetch:
                        nrec8 = jnp.concatenate(nrecs, axis=0)
                    else:
                        nrec8 = jnp.concatenate(
                            [node_ref[0:1, 0:7 * K]] * P_SUB, axis=0)
                    ch8 = nrec8[:, 6 * K:7 * K].astype(jnp.int32)

                    # ---- leaf block
                    if leaf:
                        trows = [tri_ref[pl.ds(
                            jnp.where(ltasks[s] >= 0, ltasks[s], 0), 1)]
                            for s in range(P_SUB)]
                        trow8 = jnp.concatenate(trows, axis=0)
                        st = (t_best, best)
                        for k in range(8):
                            trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                            ids = trec[:, 9:11].astype(jnp.int32)
                            st = mt_record(
                                tuple(trec[:, c:c + 1] for c in range(9)),
                                ids[:, 0:1], st)
                        t_best, best = st

                    # ---- slabs
                    def bcol(k, j):
                        c = k * 6 + j
                        return nrec8[:, c:c + 1]

                    if slab_on:
                        hks, tks = [], []
                        for k in range(K):
                            hk, tk = slab(bcol(k, 0), bcol(k, 1), bcol(k, 2),
                                          bcol(k, 3), bcol(k, 4), bcol(k, 5),
                                          t_best)
                            hks.append(hk)
                            tks.append(tk)
                    else:
                        m = (ox + i) > 0.5
                        hks = [m] * K
                        tks = [ox] * K

                    # ---- reductions (rep keys + packs)
                    if reduce_on:
                        reps = [jnp.min(jnp.where(hks[k], tks[k], BIG), axis=1,
                                        keepdims=True) for k in range(K)]
                        packs = [jnp.sum(hks[i2].astype(jnp.int32)
                                         + (hks[i2 + 1].astype(jnp.int32) << 16),
                                         axis=1, keepdims=True)
                                 for i2 in range(0, K, 2)]
                    else:
                        reps = [tks[k][:, 0:1] for k in range(K)]
                        packs = [hks[i2][:, 0:1].astype(jnp.int32) * 65537
                                 for i2 in range(0, K, 2)]

                    anyk_cols = []
                    for p2 in packs:
                        anyk_cols.extend([p2 & 0xFFFF, p2 >> 16])
                    anyk = jnp.concatenate(anyk_cols, axis=1) > 0
                    valid = anyk & (ch8 != NONE)
                    rep4 = jnp.concatenate(reps, axis=1)
                    is_leaf4 = ch8 <= -2
                    k_int = jnp.where(valid & ~is_leaf4, rep4, BIG)
                    k_leaf = jnp.where(valid & is_leaf4, rep4, BIG)

                    # ---- sorts + pair packing
                    if sort_on:
                        def vsortk(keys, codes):
                            kc = [keys[:, k:k + 1] for k in range(K)]
                            cc = [codes[:, k:k + 1] for k in range(K)]
                            for (a_, b_) in SORT_PAIRS[K]:
                                sw = kc[a_] > kc[b_]
                                kc[a_], kc[b_] = (jnp.where(sw, kc[b_], kc[a_]),
                                                  jnp.where(sw, kc[a_], kc[b_]))
                                cc[a_], cc[b_] = (jnp.where(sw, cc[b_], cc[a_]),
                                                  jnp.where(sw, cc[a_], cc[b_]))
                            return kc, cc

                        ki, ci = vsortk(k_int, ch8)
                        kl, cl = vsortk(k_leaf, ch8)
                    else:
                        ki = [k_int[:, k:k + 1] for k in range(K)]
                        ci = [ch8[:, k:k + 1] for k in range(K)]
                        kl = [k_leaf[:, k:k + 1] for k in range(K)]
                        cl = [ch8[:, k:k + 1] for k in range(K)]
                    n_int = (ki[0] < BIG).astype(jnp.int32)
                    n_leaf = (kl[0] < BIG).astype(jnp.int32)
                    for k in range(1, K):
                        n_int = n_int + (ki[k] < BIG).astype(jnp.int32)
                        n_leaf = n_leaf + (kl[k] < BIG).astype(jnp.int32)

                    empty_col = jnp.full((P_SUB, 1), EMPTY16, jnp.int32)
                    ci_e = [jnp.where(ki[k] < BIG, jnp.abs(ci[k]), EMPTY16)
                            for k in range(1, K)]
                    ci_e.append(empty_col)
                    cl_e = [jnp.where(kl[k] < BIG, jnp.abs(cl[k]), EMPTY16)
                            for k in range(1, K)]
                    cl_e.append(empty_col)
                    n_pairs = K // 2
                    pair_i = [jnp.bitwise_or(ci_e[2 * pe],
                                             jnp.left_shift(ci_e[2 * pe + 1], 16))
                              for pe in range(n_pairs)]
                    pair_l = [jnp.bitwise_or(cl_e[2 * pe],
                                             jnp.left_shift(cl_e[2 * pe + 1], 16))
                              for pe in range(n_pairs)]
                    lA_col = jnp.abs(cl[0])
                    desc_col = jnp.abs(ci[0])

                    # ---- scalar phase (production push/pop discipline,
                    # synthetic next-task so iteration counts are fixed)
                    if scalar_on:
                        def low16(x):
                            return jnp.bitwise_and(x, EMPTY16)

                        def consume(x):
                            return jnp.bitwise_or(
                                jnp.bitwise_and(jnp.right_shift(x, 16), EMPTY16),
                                SPARE_HIGH)

                        for s in range(P_SUB):
                            nt = ntasks[s]
                            sp = sp_ref[s]
                            lsp = lsp_ref[s]
                            stall = lsp >= STACK_CAP - 4 - K
                            nh_i = jnp.where(~stall, n_int[s, 0], 0)
                            nh_l = jnp.where(~stall, n_leaf[s, 0], 0)
                            base = s * STACK_CAP

                            spare = ispare_ref[s]
                            has_spare = low16(spare) != EMPTY16
                            ne = nh_i >> 1
                            spare_push = has_spare & (ne > 0)
                            stack_ref[base + sp] = spare
                            sp_eff = sp + spare_push.astype(jnp.int32)
                            for pe in range(n_pairs - 1, -1, -1):
                                stack_ref[base + sp_eff
                                          + jnp.maximum(ne - 1 - pe, 0)] = (
                                    pair_i[pe][s, 0])
                            new_sp = jnp.minimum(sp_eff + ne, STACK_CAP - 4)
                            desc = jnp.where(nh_i > 0, desc_col[s, 0], NONE)
                            spare1 = jnp.where(spare_push, SPARE_NONE, spare)
                            has_spare1 = has_spare & ~spare_push
                            use_spare = (desc == NONE) & has_spare1
                            do_pop = ((desc == NONE) & ~has_spare1
                                      & (new_sp > 0))
                            popped = stack_ref[base + jnp.maximum(new_sp - 1, 0)]
                            nxt = jnp.where(stall, nt,
                                  jnp.where(desc != NONE, desc,
                                  jnp.where(use_spare, low16(spare1),
                                  jnp.where(do_pop, low16(popped), NONE))))
                            ispare_ref[s] = jnp.where(
                                use_spare, consume(spare1),
                                jnp.where(do_pop, consume(popped), spare1))
                            # synthetic: cycle rows, keep loop data-fixed
                            ntask_ref[s] = (jnp.abs(nxt) + i) % n_nodes
                            sp_ref[s] = jnp.where(
                                do_pop, new_sp - 1,
                                jnp.minimum(new_sp, STACK_CAP // 2))

                            lspare = lspare_ref[s]
                            l_has = low16(lspare) != EMPTY16
                            nle = nh_l >> 1
                            l_spush = l_has & (nle > 0)
                            lstack_ref[base + lsp] = lspare
                            lsp_eff = lsp + l_spush.astype(jnp.int32)
                            for pe in range(n_pairs - 1, -1, -1):
                                lstack_ref[base + lsp_eff
                                           + jnp.maximum(nle - 1 - pe, 0)] = (
                                    pair_l[pe][s, 0])
                            new_lsp = jnp.minimum(lsp_eff + nle, STACK_CAP - 4)
                            lt0 = jnp.where(nh_l > 0, lA_col[s, 0], NONE)
                            lspare1 = jnp.where(l_spush, SPARE_NONE, lspare)
                            l_has1 = l_has & ~l_spush
                            l_use = (lt0 == NONE) & l_has1
                            l_pop = (lt0 == NONE) & ~l_has1 & (new_lsp > 0)
                            l_popped = lstack_ref[
                                base + jnp.maximum(new_lsp - 1, 0)]
                            ltA = jnp.where(lt0 != NONE, lt0,
                                  jnp.where(l_use, low16(lspare1),
                                  jnp.where(l_pop, low16(l_popped), NONE)))
                            lspare_ref[s] = jnp.where(
                                l_use, consume(lspare1),
                                jnp.where(l_pop, consume(l_popped), lspare1))
                            ltask_ref[s] = (jnp.abs(ltA) + i) % n_trirows
                            lsp_ref[s] = jnp.where(
                                l_pop, new_lsp - 1,
                                jnp.minimum(new_lsp, STACK_CAP // 2))
                    else:
                        for s in range(P_SUB):
                            ntask_ref[s] = (ntasks[s] + 1) % n_nodes
                            ltask_ref[s] = (ltasks[s] + 1) % n_trirows

                    # keep everything live
                    t_best = jnp.minimum(t_best, rep4[:, 0:1] + BIG)
                    return t_best, best

                t_best0 = jnp.full((P_SUB, P_LANE), BIG, jnp.float32)
                best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
                t_best, best = jax.lax.fori_loop(0, ITERS, body,
                                                 (t_best0, best0))
                t_out_ref[pl.ds(p, 1)] = (
                    t_best + best.astype(jnp.float32) * 0.0)[None]
                return 0

            jax.lax.fori_loop(0, N_PACKETS, per_packet, 0)

        pl.run_scoped(scoped,
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB * STACK_CAP,), jnp.int32),
                      pltpu.SMEM((P_SUB * STACK_CAP,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32))

    return kernel


def main():
    rng = np.random.default_rng(0)
    n_nodes, n_trirows = 3648, 13981
    node = rng.normal(size=(n_nodes, 128)).astype(np.float32)
    # child-code lanes: float-encoded mix of internal rows / leaf codes
    codes = rng.integers(0, n_nodes, size=(n_nodes, K)).astype(np.float32)
    codes[rng.random((n_nodes, K)) < 0.4] *= -1  # some "leaves"
    node[:, 6 * K:7 * K] = codes
    tri = rng.normal(size=(n_trirows, 128)).astype(np.float32)
    o = rng.normal(size=(N_PACKETS, 3, P_SUB, P_LANE)).astype(np.float32)
    d = rng.normal(size=(N_PACKETS, 3, P_SUB, P_LANE)).astype(np.float32)
    d = np.where(np.abs(d) < 1e-3, 1e-3, d)

    node_j, tri_j = jnp.asarray(node), jnp.asarray(tri)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    variants = ("full", "no_fetch", "no_leaf", "no_slab", "no_reduce",
                "no_sort", "no_scalar")
    base = None
    for v in variants:
        fn = jax.jit(pl.pallas_call(
            make_kernel(v, n_nodes, n_trirows),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_PACKETS, P_SUB, P_LANE),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        ))
        np.asarray(fn(node_j, tri_j, o_j, d_j))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(node_j, tri_j, o_j, d_j))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        us = (dt - 0.025) / (ITERS * N_PACKETS) * 1e6
        line = f"{v:10s}: {dt*1e3:8.2f} ms  {us:6.3f} us/iter"
        if v == "full":
            base = us
        else:
            line += f"   phase cost {base - us:+6.3f} us"
        print(line, flush=True)


if __name__ == "__main__":
    main()
