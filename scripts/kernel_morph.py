"""Morph the (passing) ablation kernel toward the (faulting) real
traversal kernel one structural delta at a time, to isolate which delta
triggers the on-chip FAILED_PRECONDITION device fault.

Deltas (ablation -> real):
  loop:   fori (fixed iters)      -> while (data-dependent alive count)
  outs:   1 output                -> 6 outputs
  init:   all sub-warps at root   -> root-slab-gated init (+alive count)
  brute:  no pre-pass             -> static brute rows pre-pass
  clamp:  clamped stack pushes    -> UNCLAMPED (new_sp = sp + max(nhit-1,0))

Driver mode runs each variant in a fresh subprocess (a device fault
wedges the client):

    python scripts/kernel_morph.py            # all variants
    python scripts/kernel_morph.py v3         # one variant in-process
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

VARIANTS = {
    # name: (loop, outs, init, brute, clamp)
    "v0_ablate": ("fori", 1, "all", False, True),
    "v1_while": ("while", 1, "all", False, True),
    "v2_outs6": ("while", 6, "all", False, True),
    "v3_rootinit": ("while", 6, "root", False, True),
    "v4_brute": ("while", 6, "root", True, True),
    "v5_noclamp": ("while", 6, "root", True, False),
    "v0_noclamp": ("fori", 1, "all", False, False),
    # while_loop whose cond is a COUNTER (semantically the fori of
    # v0_ablate, but lowered through the while primitive) — isolates the
    # while lowering from the alive-count data dependence.
    "v6_whilecounter": ("whilecounter", 1, "all", False, True),
    # while_loop on the alive count but with restart-at-root tasks (the
    # count never reaches 0; body capped by a counter as a safety) —
    # isolates the scalar alive-sum chain.
    "v7_whilealive_cap": ("whilealivecap", 1, "all", False, True),
    # Capped while + the remaining real-kernel features, one at a time.
    "v8_cap_outs6": ("whilealivecap", 6, "all", False, True),
    "v9_cap_rootinit": ("whilealivecap", 6, "root", False, True),
    "v10_cap_brute": ("whilealivecap", 6, "root", True, True),
    "v11_cap_noclamp": ("whilealivecap", 6, "root", True, False),
}


def run_variant(name):
    loop, n_outs, init, brute, clamp = VARIANTS[name]

    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytracer_tpu.ops.pallas_traverse import (
        BIG, HALF_BIG, NODE_STRIDE, NONE, P_LANE, P_SUB, TRI_STRIDE,
        _pack_tables, _select_record)
    from raytracer_tpu.scene.builder import reference_scene

    ITERS = 40
    N_PACKETS = 8

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    stack_cap = int(scene.bvh4.stack_depth)
    node_pack, tri_pack, _, n_brute_rows = _pack_tables(
        scene.bvh4, scene.bvh4.face_mat)
    node_pack, tri_pack = jax.block_until_ready((node_pack, tri_pack))
    zero_row = tri_pack.shape[0] - 1
    brute_rows = tuple(range(zero_row - n_brute_rows, zero_row)) if brute else ()
    t_min = 1e-3

    def kernel(node_ref, tri_ref, o_ref, d_ref, tlim_ref, *out_refs):
        def body_scoped(task_ref, sp_ref, stack_ref):
            def per_packet(p, _):
                o_pk = o_ref[pl.ds(p, 1)][0]
                d_pk = d_ref[pl.ds(p, 1)][0]
                ox, oy, oz = o_pk[0], o_pk[1], o_pk[2]
                dx, dy, dz = d_pk[0], d_pk[1], d_pk[2]
                ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
                t_best0 = tlim_ref[pl.ds(p, 1)][0]
                best0 = jnp.full((P_SUB, P_LANE), NONE, jnp.int32)
                mat0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
                n0 = jnp.zeros((P_SUB, P_LANE), jnp.float32)

                def slab(lx, ly, lz, hx, hy, hz, t_best):
                    t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
                    t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
                    t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
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

                state0 = (t_best0, best0, mat0, n0, n0, n0)
                for r in brute_rows:
                    row = tri_ref[r:r + 1]
                    trow = jnp.concatenate([row] * P_SUB, axis=0)
                    for k in range(8):
                        trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                        ids = trec[:, 9:11].astype(jnp.int32)  # float-encoded ids
                        state0 = mt_record(
                            tuple(trec[:, c:c + 1] for c in range(9)),
                            ids[:, 0:1], ids[:, 1:2], state0)
                t_best0, best0, mat0, n0x, n0y, n0z = state0

                if init == "root":
                    rec0 = node_ref[0:1, 0:NODE_STRIDE]
                    neg = jnp.float32(-BIG)

                    def bval0(k, j):
                        return rec0[0, k * 6 + j]

                    finite = [bval0(k, 3) > -BIG for k in range(4)]

                    def min4(j):
                        return jnp.minimum(
                            jnp.minimum(bval0(0, j), bval0(1, j)),
                            jnp.minimum(bval0(2, j), bval0(3, j)))

                    def max4(j):
                        vals = [jnp.where(finite[k], bval0(k, j), neg)
                                for k in range(4)]
                        return jnp.maximum(jnp.maximum(vals[0], vals[1]),
                                           jnp.maximum(vals[2], vals[3]))

                    rhit, _ = slab(min4(0), min4(1), min4(2),
                                   max4(3), max4(4), max4(5), t_best0)
                    alive_cnt = jnp.sum(rhit.astype(jnp.int32), axis=1,
                                        keepdims=True)
                    n_alive0 = jnp.int32(0)
                    for s in range(P_SUB):
                        t0s = jnp.where(alive_cnt[s, 0] > 0, jnp.int32(0), NONE)
                        task_ref[s] = t0s
                        sp_ref[s] = jnp.int32(0)
                        n_alive0 += (t0s != NONE).astype(jnp.int32)
                else:
                    for s in range(P_SUB):
                        task_ref[s] = jnp.int32(0)
                        sp_ref[s] = jnp.int32(0)
                    n_alive0 = jnp.int32(P_SUB)

                def body_core(carry):
                    n_alive, t_best, best, mat, nx, ny, nz = carry
                    nrecs, trows, tasks = [], [], []
                    for s in range(P_SUB):
                        task = task_ref[s]
                        tasks.append(task)
                        is_int = task >= 0
                        is_leaf = task <= -2
                        code = -task - 2
                        nrow = node_ref[pl.ds(jnp.where(is_int, task // 4, 0), 1)]
                        nrecs.append(_select_record(
                            nrow, jnp.where(is_int, task % 4, 0), 4, NODE_STRIDE))
                        trows.append(tri_ref[pl.ds(
                            jnp.where(is_leaf, code // 64, zero_row), 1)])
                    nrec8 = jnp.concatenate(nrecs, axis=0)
                    trow8 = jnp.concatenate(trows, axis=0)
                    ch8 = nrec8[:, 24:28].astype(jnp.int32)  # float-encoded codes

                    state = (t_best, best, mat, nx, ny, nz)
                    for k in range(8):
                        trec = trow8[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
                        ids = trec[:, 9:11].astype(jnp.int32)  # float-encoded ids
                        state = mt_record(
                            tuple(trec[:, c:c + 1] for c in range(9)),
                            ids[:, 0:1], ids[:, 1:2], state)
                    t_best, best, mat, nx, ny, nz = state

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

                    new_alive = jnp.int32(0)
                    for s in range(P_SUB):
                        task = tasks[s]
                        is_int = task >= 0
                        a01 = pa[s, 0]
                        a23 = pb[s, 0]
                        anyk = [(a01 & 0xFFFF) > 0, (a01 >> 16) > 0,
                                (a23 & 0xFFFF) > 0, (a23 >> 16) > 0]
                        anyk = [a & (ch8[s, k] != NONE) for k, a in enumerate(anyk)]
                        nhit = (anyk[0].astype(jnp.int32)
                                + anyk[1].astype(jnp.int32)
                                + anyk[2].astype(jnp.int32)
                                + anyk[3].astype(jnp.int32))
                        nhit = jnp.where(is_int, nhit, 0)
                        tm = [jnp.where(anyk[k], reps[k][s, 0], BIG)
                              for k in range(4)]
                        cc = [ch8[s, 0], ch8[s, 1], ch8[s, 2], ch8[s, 3]]
                        for (i, j) in ((0, 2), (1, 3), (0, 1), (2, 3), (1, 2)):
                            swap = tm[i] > tm[j]
                            tm[i], tm[j] = (jnp.where(swap, tm[j], tm[i]),
                                            jnp.where(swap, tm[i], tm[j]))
                            cc[i], cc[j] = (jnp.where(swap, cc[j], cc[i]),
                                            jnp.where(swap, cc[i], cc[j]))
                        sp = sp_ref[s]
                        base = s * stack_cap
                        for k in (3, 2, 1):
                            stack_ref[base + sp + jnp.maximum(nhit - 1 - k, 0)] = cc[k]
                        if clamp:
                            new_sp = jnp.minimum(sp + jnp.maximum(nhit - 1, 0),
                                                 stack_cap - 4)
                        else:
                            new_sp = sp + jnp.maximum(nhit - 1, 0)
                        desc = jnp.where(nhit > 0, cc[0], NONE)
                        do_pop = (desc == NONE) & (new_sp > 0) & (task != NONE)
                        popped = stack_ref[base + jnp.maximum(new_sp - 1, 0)]
                        nxt = jnp.where(do_pop, popped, desc)
                        if loop in ("fori", "whilecounter", "whilealivecap"):
                            # keep hot for fixed-iteration timing
                            task_ref[s] = jnp.where(nxt == NONE, 0, nxt)
                        else:
                            task_ref[s] = nxt
                        sp_ref[s] = jnp.where(do_pop, new_sp - 1, new_sp)
                        new_alive += (nxt != NONE).astype(jnp.int32)

                    return new_alive, t_best, best, mat, nx, ny, nz

                if loop == "while":
                    out = jax.lax.while_loop(
                        lambda c: c[0] > 0, body_core,
                        (n_alive0, t_best0, best0, mat0, n0x, n0y, n0z))
                elif loop in ("whilecounter", "whilealivecap"):
                    # carry: (counter,) + body_core's 7-tuple.
                    def body_c(c):
                        return (c[0] - 1,) + tuple(body_core(c[1:]))

                    if loop == "whilecounter":
                        # cond on the counter only (data-independent).
                        def cond_c(c):
                            return c[0] > 0
                    else:
                        # cond also reads the DATA-DEPENDENT alive count
                        # (restart-at-root keeps it >0; counter caps).
                        def cond_c(c):
                            return (c[0] > 0) & (c[1] > 0)

                    out = jax.lax.while_loop(
                        cond_c, body_c,
                        (jnp.int32(ITERS), n_alive0, t_best0, best0, mat0,
                         n0x, n0y, n0z))[1:]
                else:
                    out = jax.lax.fori_loop(
                        0, ITERS, lambda i, c: body_core(c),
                        (n_alive0, t_best0, best0, mat0, n0x, n0y, n0z))
                _, t_best, best, mat, nx, ny, nz = out
                results = (t_best, best, mat, nx, ny, nz)
                for i in range(n_outs):
                    out_refs[i][pl.ds(p, 1)] = results[i][None]
                return 0

            jax.lax.fori_loop(0, N_PACKETS, per_packet, 0)

        pl.run_scoped(body_scoped,
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB,), jnp.int32),
                      pltpu.SMEM((P_SUB * stack_cap,), jnp.int32))

    rng = np.random.default_rng(3)
    n = N_PACKETS * 1024
    o = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = dd / np.linalg.norm(dd, axis=1, keepdims=True)
    o_pk = jnp.asarray(o).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    d_pk = jnp.asarray(d).reshape(N_PACKETS, 1024, 3).transpose(0, 2, 1).reshape(
        N_PACKETS, 3, P_SUB, P_LANE)
    tlim = jnp.full((N_PACKETS, P_SUB, P_LANE), BIG, jnp.float32)

    dtypes = (jnp.float32, jnp.int32, jnp.int32,
              jnp.float32, jnp.float32, jnp.float32)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_outs,
        out_shape=[jax.ShapeDtypeStruct((N_PACKETS, P_SUB, P_LANE), dtypes[i])
                   for i in range(n_outs)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    ))(node_pack, tri_pack, o_pk, d_pk, tlim)
    outs = out if isinstance(out, (list, tuple)) else [out]
    t = np.asarray(outs[0])
    hitn = int((t < 1e30).sum())
    return f"ok hit={hitn}/{n}"


def driver():
    for name in VARIANTS:
        p = subprocess.run(
            [sys.executable, "-u", __file__, name],
            capture_output=True, text=True, timeout=560)
        line = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
        err = (p.stderr.strip().splitlines() or [""])[-1]
        status = "PASS" if p.returncode == 0 else "FAIL"
        print(f"{status} {name}: {line if p.returncode == 0 else err[:160]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(run_variant(sys.argv[1]), flush=True)
    else:
        driver()
