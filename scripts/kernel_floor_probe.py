"""Probe: decompose the ~1.5 us/iteration 'minimal' floor measured by
kernel_base_probe.py (loop + 8 SMEM task round-trips), and measure the
production body with task/sp state moved from SMEM into loop CARRIES.

Variants (all fixed iteration count, same outer structure):

  empty     — fori_loop whose body only bumps a scalar carry (+ one
              vector add so the loop isn't folded away)
  carry8    — 8 per-sub-warp task scalars updated per iteration as LOOP
              CARRIES (wheres only, no SMEM)
  smem8     — the same 8 task updates through SMEM (== base probe's
              'minimal')
  prod_smem — full production-shaped body (loads, selects, MT x8,
              slabs x4, decision chains, SMEM stack) with task/sp in
              SMEM — reference point for the real kernel (~2.9 us)
  prod_carry— identical body but task/sp as loop carries; only the
              stack stays in SMEM

If carry8 << smem8, the next kernel keeps traversal state in carries
and the floor is the SMEM round-trips; if carry8 ~= smem8 ~= empty,
the floor is the loop itself and the only lever is fewer/bigger
iterations.

Usage: python scripts/kernel_floor_probe.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.pallas_traverse import (
    BIG, HALF_BIG, NODE_STRIDE, NONE, P_LANE, P_SUB, TRI_STRIDE,
    _pack_tables, _select_record)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 119
N_PACKETS = 128
STACK_CAP = 40


def make_kernel(mode: str, zero_row: int):
    carries = mode in ("carry8", "prod_carry")
    prod = mode.startswith("prod")

    def kernel(node_ref, tri_ref, o_ref, d_ref, tlim_ref, t_out_ref):
        def body_scoped(task_ref, sp_ref, stack_ref):
            def per_packet(p, _):
                o_pk = o_ref[pl.ds(p, 1)][0]
                d_pk = d_ref[pl.ds(p, 1)][0]
                ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]
                dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
                ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
                t_best0 = tlim_ref[pl.ds(p, 1)][0]

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

                for s in range(P_SUB):
                    task_ref[s] = jnp.int32(0)
                    sp_ref[s] = jnp.int32(0)

                if mode == "empty":
                    def body(it, carry):
                        t_best, cnt = carry
                        return t_best + 1.0, cnt + 1

                    t_best, _ = jax.lax.fori_loop(
                        0, ITERS, body, (t_best0, jnp.int32(0)))
                    t_out_ref[pl.ds(p, 1)] = t_best[None]
                    return 0

                if mode in ("carry8", "smem8"):
                    if carries:
                        def body(it, carry):
                            t_best, tasks = carry
                            new = tuple(
                                jnp.where(t >= 1000, 0, t + 1) for t in tasks)
                            return t_best + 1.0, new

                        t_best, _ = jax.lax.fori_loop(
                            0, ITERS, body,
                            (t_best0, tuple(jnp.int32(0) for _ in range(P_SUB))))
                    else:
                        def body(it, t_best):
                            for s in range(P_SUB):
                                t = task_ref[s]
                                task_ref[s] = jnp.where(t >= 1000, 0, t + 1)
                            return t_best + 1.0

                        t_best = jax.lax.fori_loop(0, ITERS, body, t_best0)
                    t_out_ref[pl.ds(p, 1)] = t_best[None]
                    return 0

                # --- production-shaped body (prod_smem / prod_carry) ---
                def step(tasks, sps, t_best, best):
                    nrecs, trows = [], []
                    for s in range(P_SUB):
                        task = tasks[s]
                        is_int = task >= 0
                        is_leaf = task <= -2
                        code = -task - 2
                        nrow = node_ref[pl.ds(jnp.where(is_int, task // 4, 0), 1)]
                        nrecs.append(_select_record(
                            nrow, jnp.where(is_int, task % 4, 0), 4, NODE_STRIDE))
                        trows.append(
                            tri_ref[pl.ds(jnp.where(is_leaf, code // 64, zero_row), 1)])
                    nrec8 = jnp.concatenate(nrecs, axis=0)
                    trow8 = jnp.concatenate(trows, axis=0)
                    ch8 = nrec8[:, 24:28].astype(jnp.int32)

                    for k in range(8):
                        trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                        v0x, v0y, v0z = trec[:, 0:1], trec[:, 1:2], trec[:, 2:3]
                        e1x, e1y, e1z = trec[:, 3:4], trec[:, 4:5], trec[:, 5:6]
                        e2x, e2y, e2z = trec[:, 6:7], trec[:, 7:8], trec[:, 8:9]
                        ids = trec[:, 9:11].astype(jnp.int32)
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
                        ok &= (t >= 1e-3) & (t < t_best)
                        t_best = jnp.where(ok, t, t_best)
                        best = jnp.where(ok, ids[:, 0:1], best)

                    def bcol(k, j):
                        c = k * 6 + j
                        return nrec8[:, c:c + 1]

                    hks, reps = [], []
                    for k in range(4):
                        hk, tk = slab(bcol(k, 0), bcol(k, 1), bcol(k, 2),
                                      bcol(k, 3), bcol(k, 4), bcol(k, 5), t_best)
                        hks.append(hk)
                        reps.append(jnp.where(hk, tk, HALF_BIG)[:, 0:1])
                    pa = jnp.sum(hks[0].astype(jnp.int32)
                                 + (hks[1].astype(jnp.int32) << 16),
                                 axis=1, keepdims=True)
                    pb = jnp.sum(hks[2].astype(jnp.int32)
                                 + (hks[3].astype(jnp.int32) << 16),
                                 axis=1, keepdims=True)

                    new_tasks, new_sps = [], []
                    for s in range(P_SUB):
                        task = tasks[s]
                        is_int = task >= 0
                        a01 = pa[s, 0]
                        a23 = pb[s, 0]
                        anyk = [(a01 & 0xFFFF) > 0, (a01 >> 16) > 0,
                                (a23 & 0xFFFF) > 0, (a23 >> 16) > 0]
                        anyk = [a & (ch8[s, k] != NONE) for k, a in enumerate(anyk)]
                        nhit = (anyk[0].astype(jnp.int32) + anyk[1].astype(jnp.int32)
                                + anyk[2].astype(jnp.int32) + anyk[3].astype(jnp.int32))
                        nhit = jnp.where(is_int, nhit, 0)
                        tm = [jnp.where(anyk[k], reps[k][s, 0], BIG) for k in range(4)]
                        cc = [ch8[s, 0], ch8[s, 1], ch8[s, 2], ch8[s, 3]]
                        for (i, j) in ((0, 2), (1, 3), (0, 1), (2, 3), (1, 2)):
                            swap = tm[i] > tm[j]
                            tm[i], tm[j] = (jnp.where(swap, tm[j], tm[i]),
                                            jnp.where(swap, tm[i], tm[j]))
                            cc[i], cc[j] = (jnp.where(swap, cc[j], cc[i]),
                                            jnp.where(swap, cc[i], cc[j]))
                        sp = sps[s] if carries else sp_ref[s]
                        base_i = s * STACK_CAP
                        for k in (3, 2, 1):
                            stack_ref[base_i + sp + jnp.maximum(nhit - 1 - k, 0)] = cc[k]
                        new_sp = jnp.minimum(sp + jnp.maximum(nhit - 1, 0),
                                             STACK_CAP - 4)
                        desc = jnp.where(nhit > 0, cc[0], NONE)
                        do_pop = (desc == NONE) & (new_sp > 0) & (task != NONE)
                        popped = stack_ref[base_i + jnp.maximum(new_sp - 1, 0)]
                        nxt = jnp.where(do_pop, popped, desc)
                        nxt = jnp.where(nxt == NONE, 0, nxt)  # keep iterating
                        nsp = jnp.where(do_pop, new_sp - 1, new_sp)
                        if carries:
                            new_tasks.append(nxt)
                            new_sps.append(nsp)
                        else:
                            task_ref[s] = nxt
                            sp_ref[s] = nsp
                    return tuple(new_tasks), tuple(new_sps), t_best, best

                best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
                if carries:
                    def body(it, carry):
                        tasks, sps, t_best, best = carry
                        return step(tasks, sps, t_best, best)

                    zero8 = tuple(jnp.int32(0) for _ in range(P_SUB))
                    _, _, t_best, best = jax.lax.fori_loop(
                        0, ITERS, body, (zero8, zero8, t_best0, best0))
                else:
                    def body(it, carry):
                        t_best, best = carry
                        tasks = [task_ref[s] for s in range(P_SUB)]
                        _, _, t_best, best = step(tasks, None, t_best, best)
                        return t_best, best

                    t_best, best = jax.lax.fori_loop(
                        0, ITERS, body, (t_best0, best0))
                t_out_ref[pl.ds(p, 1)] = t_best[None]
                return 0

            jax.lax.fori_loop(0, N_PACKETS, per_packet, 0)

        pl.run_scoped(body_scoped,
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB * STACK_CAP,), jnp.int32))

    return kernel


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    from raytracer_tpu.scene.builder import reference_scene

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    node_pack, tri_pack, _, _ = _pack_tables(scene.bvh4, scene.bvh4.face_mat)
    node_pack, tri_pack = jax.block_until_ready((node_pack, tri_pack))
    zero_row = tri_pack.shape[0] - 1

    rng = np.random.default_rng(0)
    n = N_PACKETS * 1024
    o = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = dd / np.linalg.norm(dd, axis=1, keepdims=True)
    o_pk = jnp.asarray(o).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    d_pk = jnp.asarray(d).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    tlim = jnp.full((N_PACKETS, P_SUB, P_LANE), BIG, jnp.float32)

    for mode in ("empty", "carry8", "smem8", "prod_smem", "prod_carry"):
        fn = jax.jit(lambda a, b, c, d2, e, m=mode: pl.pallas_call(
            make_kernel(m, zero_row),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_PACKETS, P_SUB, P_LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(a, b, c, d2, e))
        out = fn(node_pack, tri_pack, o_pk, d_pk, tlim)
        out.block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn(node_pack, tri_pack, o_pk, d_pk, tlim).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        per_iter = best / (N_PACKETS * ITERS) * 1e6
        print(f"{mode:10s}: {best*1e3:7.1f} ms total -> {per_iter:6.3f} us/iter",
              flush=True)


if __name__ == "__main__":
    main()
