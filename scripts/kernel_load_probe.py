"""Probe: how much of the traversal iteration is VMEM row LOADS?

kernel_ablate.py leaves a ~1.35 us/iteration base that no phase knockout
explains — but every variant still issues 16 row loads (no_fetch only
makes them static). Interleave probing (kernel_interleave_probe.py)
showed independent packets do NOT overlap, i.e. the body serializes on
some unit. This script bisects the loads:

  full16  — node row + tri row per sub-warp (16 loads/iter), v5 layout
  loads8  — ONE row per sub-warp; the tri row is the node row reused
            (results are garbage; instruction stream otherwise identical)
  loads0  — rows synthesized from the loop carry (no loads at all;
            garbage; same downstream vector/scalar work)

If us/iter drops ~linearly with load count, the next kernel must fetch
ONE unified row per sub-warp per iteration (row-per-node layout with
MT-safe lane placement).

Usage: python scripts/kernel_load_probe.py [iters]
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

                def body(it, carry):
                    t_best, best = carry
                    nrecs, trows, tasks = [], [], []
                    for s in range(P_SUB):
                        task = task_ref[s]
                        tasks.append(task)
                        is_int = task >= 0
                        is_leaf = task <= -2
                        code = -task - 2
                        if mode == "loads0":
                            # No loads: synthesize both rows from the carry
                            # (loop-variant so nothing hoists).
                            fake = t_best[0:1] + jnp.float32(task)
                            nrecs.append(fake[:, 0:NODE_STRIDE])
                            trows.append(fake)
                            continue
                        nrow = node_ref[pl.ds(jnp.where(is_int, task // 4, 0), 1)]
                        nrecs.append(_select_record(
                            nrow, jnp.where(is_int, task % 4, 0), 4, NODE_STRIDE))
                        if mode == "loads8":
                            trows.append(nrow)  # reuse: no second load
                        else:
                            trows.append(tri_ref[pl.ds(
                                jnp.where(is_leaf, code // 64, zero_row), 1)])
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
                        sp = sp_ref[s]
                        base = s * STACK_CAP
                        for k in (3, 2, 1):
                            stack_ref[base + sp + jnp.maximum(nhit - 1 - k, 0)] = cc[k]
                        new_sp = jnp.minimum(sp + jnp.maximum(nhit - 1, 0),
                                             STACK_CAP - 4)
                        desc = jnp.where(nhit > 0, cc[0], NONE)
                        do_pop = (desc == NONE) & (new_sp > 0) & (task != NONE)
                        popped = stack_ref[base + jnp.maximum(new_sp - 1, 0)]
                        nxt = jnp.where(do_pop, popped, desc)
                        task_ref[s] = jnp.where(nxt == NONE, 0, nxt)
                        sp_ref[s] = jnp.where(do_pop, new_sp - 1, new_sp)

                    return t_best, best

                t_best, best = jax.lax.fori_loop(
                    0, ITERS, body,
                    (t_best0, jnp.full((P_SUB, P_LANE), NONE, jnp.int32)))
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
    fmat = scene.bvh4.face_mat
    node_pack, tri_pack, _, _ = _pack_tables(scene.bvh4, fmat)
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

    for mode in ("full16", "loads8", "loads0"):
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
        print(f"{mode:8s}: {best*1e3:7.1f} ms total -> {per_iter:6.3f} us/iter",
              flush=True)


if __name__ == "__main__":
    main()
