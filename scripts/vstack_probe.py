"""Probes for the VECTOR SHIFT-REGISTER STACK primitives (round-5
traversal core): an (8,128) i32 while-loop carry used as 8 per-sublane
stacks, top at lane 0, pushed/popped with lane-axis concat-slices
selected per chain by (8,1) masks.

Each case runs in a SUBPROCESS (CLAUDE.md rule — a device fault kills
the process) and checks against a NumPy model.

Cases:
  p1  correctness: per-chain mixed push/pop streams through the vreg
      stack reproduce a NumPy stack exactly (values + final sp).
  p2  timing: per-iteration cost of the vector stack discipline vs the
      SMEM scalar store/load discipline at matched logical work.

Usage: python scripts/vstack_probe.py [p1|p2]  (no arg = run all via
subprocesses)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

P_SUB, P_LANE = 8, 128


def _setup():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, np, pl, pltpu


def p1():
    """Push/pop correctness. Per iteration i (64 iterations), chain s
    pushes c(s,i) in 0..3 values (distinct, derived from (s,i,j)) then
    pops one value if it did not push. Output: the sequence of popped
    values per chain (64 lanes) + final stack prefix."""
    jax, jnp, np, pl, pltpu = _setup()

    N_IT = 64

    def counts(s, i):
        return (s + 2 * i) % 4  # 0..3 pushes

    def val(s, i, j):
        return 1000 * s + 10 * i + j + 1

    # NumPy model.
    popped_exp = np.zeros((P_SUB, N_IT), np.int32)
    stacks = [[] for _ in range(P_SUB)]
    for i in range(N_IT):
        for s in range(P_SUB):
            c = counts(s, i)
            # push j = c-1 .. 0 so j=0 ends on top (near-first order)
            for j in range(c - 1, -1, -1):
                stacks[s].append(val(s, i, j))
            if c == 0 and stacks[s]:
                popped_exp[s, i] = stacks[s].pop()

    def kernel(o_pop_ref, o_stk_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 0)
        zero_col = jnp.zeros((P_SUB, 1), jnp.int32)

        def shift_in(S, col):
            return jnp.concatenate([col, S[:, : P_LANE - 1]], axis=1)

        def shift_out(S):
            return jnp.concatenate([S[:, 1:], zero_col], axis=1)

        def body(i, carry):
            S, sp, pop_acc = carry
            c_col = (sub[:, 0:1] + 2 * i) % 4                 # (8,1)
            # push j = c-1..0 (incremental shift-ins, masked by j < c)
            for j in range(2, -1, -1):
                vcol = 1000 * sub[:, 0:1] + 10 * i + j + 1
                do = (j < c_col)
                S = jnp.where(do, shift_in(S, vcol), S)
                sp = sp + do.astype(jnp.int32)
            do_pop = (c_col == 0) & (sp > 0)
            top = S[:, 0:1]
            popped = jnp.where(do_pop, top, zero_col)
            S = jnp.where(do_pop, shift_out(S), S)
            sp = sp - do_pop.astype(jnp.int32)
            pop_acc = jnp.where(lane == i, popped, pop_acc)
            return S, sp, pop_acc

        S0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        sp0 = jnp.zeros((P_SUB, 1), jnp.int32)
        acc0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        S, sp, acc = jax.lax.fori_loop(0, N_IT, body, (S0, sp0, acc0))
        o_pop_ref[...] = acc
        o_stk_ref[...] = S

    fn = pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32)] * 2,
    )
    got_pop, got_stk = (np.asarray(x) for x in jax.jit(fn)())
    ok = (got_pop[:, :N_IT] == popped_exp).all()
    # Final stack prefix: top at lane 0.
    ok_stk = True
    for s in range(P_SUB):
        exp = list(reversed(stacks[s]))[:32]
        ok_stk &= (got_stk[s, : len(exp)] == np.asarray(exp, np.int32)).all()
    print(f"p1 push/pop correctness: pops {'OK' if ok else 'FAIL'}, "
          f"stack {'OK' if ok_stk else 'FAIL'}", flush=True)
    return 0 if (ok and ok_stk) else 1


def p2():
    """Per-iteration cost: N iterations of (masked push x3 + masked pop)
    on (a) the vreg shift-register stack and (b) SMEM stacks with the
    production per-chain scalar discipline. Dummy vector work keeps the
    loop from being optimized away; report delta per iteration."""
    jax, jnp, np, pl, pltpu = _setup()
    import time

    N_IT = 20000

    def make(kind):
        def kernel(o_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 0)
            zero_col = jnp.zeros((P_SUB, 1), jnp.int32)

            def shift_in(S, col):
                return jnp.concatenate([col, S[:, : P_LANE - 1]], axis=1)

            def shift_out(S):
                return jnp.concatenate([S[:, 1:], zero_col], axis=1)

            if kind == "vreg":
                def body(i, carry):
                    S, sp, acc = carry
                    c_col = (sub[:, 0:1] + 2 * i) % 4
                    for j in range(2, -1, -1):
                        vcol = 1000 * sub[:, 0:1] + 10 * (i % 50) + j
                        do = (j < c_col)
                        S = jnp.where(do, shift_in(S, vcol), S)
                        sp = sp + do.astype(jnp.int32)
                    do_pop = (c_col == 0) & (sp > 0)
                    top = S[:, 0:1]
                    acc = acc + jnp.where(do_pop, top, zero_col)
                    S = jnp.where(do_pop, shift_out(S), S)
                    sp = sp - do_pop.astype(jnp.int32)
                    return S, sp, acc

                S0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
                sp0 = jnp.zeros((P_SUB, 1), jnp.int32)
                acc0 = jnp.zeros((P_SUB, 1), jnp.int32)
                S, sp, acc = jax.lax.fori_loop(0, N_IT, body,
                                               (S0, sp0, acc0))
                o_ref[...] = (acc + sp + S[:, 0:1]).astype(jnp.float32) * jnp.ones(
                    (P_SUB, P_LANE), jnp.float32)
            else:
                def scoped(stack_ref, sp_ref):
                    for s in range(P_SUB):
                        sp_ref[s] = jnp.int32(0)

                    def body(i, acc):
                        c_col = (sub[:, 0:1] + 2 * i) % 4
                        vals = [1000 * sub[:, 0:1] + 10 * (i % 50) + j
                                for j in range(3)]
                        out = acc
                        for s in range(P_SUB):
                            c = c_col[s, 0]
                            sp = sp_ref[s]
                            base = s * 96
                            for j in range(2, -1, -1):
                                stack_ref[base + sp + jnp.maximum(
                                    c - 1 - j, 0)] = vals[j][s, 0]
                            nsp = jnp.minimum(sp + c, 92)
                            do_pop = (c == 0) & (nsp > 0)
                            popped = stack_ref[base + jnp.maximum(nsp - 1, 0)]
                            out = out + jnp.where(do_pop, popped, 0)
                            sp_ref[s] = jnp.where(do_pop, nsp - 1, nsp)
                        return out

                    acc = jax.lax.fori_loop(0, N_IT, body, jnp.int32(0))
                    o_ref[...] = acc.astype(jnp.float32) * jnp.ones(
                        (P_SUB, P_LANE), jnp.float32)

                pl.run_scoped(scoped,
                              pltpu.SMEM((P_SUB * 96,), jnp.int32),
                              pltpu.SMEM((P_SUB,), jnp.int32))

        return pl.pallas_call(
            kernel,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.float32),
        )

    for kind in ("vreg", "smem"):
        fn = jax.jit(make(kind))
        np.asarray(fn())  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"p2 {kind}: {dt*1e3:.2f} ms total, "
              f"{(dt - 0.025) / N_IT * 1e9:.1f} ns/iter (floor-corrected)",
              flush=True)
    return 0


def p3():
    """POINTER-based vreg stack: data never moves; push writes through a
    (lane == sp) mask, pop reads via a masked lane-reduction. Checks
    correctness against the same NumPy model as p1, then times the p2
    workload."""
    jax, jnp, np, pl, pltpu = _setup()
    import time

    N_IT = 64

    def counts(s, i):
        return (s + 2 * i) % 4

    def val(s, i, j):
        return 1000 * s + 10 * i + j + 1

    popped_exp = np.zeros((P_SUB, N_IT), np.int32)
    stacks = [[] for _ in range(P_SUB)]
    for i in range(N_IT):
        for s in range(P_SUB):
            c = counts(s, i)
            for j in range(c - 1, -1, -1):
                stacks[s].append(val(s, i, j))
            if c == 0 and stacks[s]:
                popped_exp[s, i] = stacks[s].pop()

    def kernel(o_pop_ref, o_stk_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 0)
        zero_col = jnp.zeros((P_SUB, 1), jnp.int32)

        def body(i, carry):
            S, sp, pop_acc = carry
            c_col = (sub[:, 0:1] + 2 * i) % 4
            # push j = c-1..0 at positions sp .. sp+c-1 (j=0 ends on
            # top = HIGHEST position; top = sp-1 after push)
            for j in range(3):
                vcol = 1000 * sub[:, 0:1] + 10 * i + j + 1
                do = (j < c_col)
                pos = jnp.where(do, sp + c_col - 1 - j, jnp.int32(-1))
                S = jnp.where(lane == pos, vcol, S)
            sp = sp + c_col
            do_pop = (c_col == 0) & (sp > 0)
            top = jnp.sum(jnp.where(lane == sp - 1, S, 0), axis=1,
                          keepdims=True)
            popped = jnp.where(do_pop, top, zero_col)
            sp = sp - do_pop.astype(jnp.int32)
            pop_acc = jnp.where(lane == i, popped, pop_acc)
            return S, sp, pop_acc

        S0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        sp0 = jnp.zeros((P_SUB, 1), jnp.int32)
        acc0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        S, sp, acc = jax.lax.fori_loop(0, N_IT, body, (S0, sp0, acc0))
        o_pop_ref[...] = acc
        o_stk_ref[...] = S

    fn = pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32)] * 2,
    )
    got_pop, got_stk = (np.asarray(x) for x in jax.jit(fn)())
    ok = (got_pop[:, :N_IT] == popped_exp).all()
    ok_stk = True
    for s in range(P_SUB):
        exp = stacks[s][:32]  # bottom-up at lanes 0..
        ok_stk &= (got_stk[s, : len(exp)] == np.asarray(exp, np.int32)).all()
    print(f"p3 pointer-stack correctness: pops {'OK' if ok else 'FAIL'}, "
          f"stack {'OK' if ok_stk else 'FAIL'}", flush=True)

    # Timing at the p2 workload.
    N_T = 20000

    def tkernel(o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 0)
        zero_col = jnp.zeros((P_SUB, 1), jnp.int32)

        def body(i, carry):
            S, sp, acc = carry
            c_col = (sub[:, 0:1] + 2 * i) % 4
            for j in range(3):
                vcol = 1000 * sub[:, 0:1] + 10 * (i % 50) + j
                do = (j < c_col)
                pos = jnp.where(do, sp + c_col - 1 - j, jnp.int32(-1))
                S = jnp.where(lane == pos, vcol, S)
            sp = jnp.minimum(sp + c_col, 90)
            do_pop = (c_col == 0) & (sp > 0)
            top = jnp.sum(jnp.where(lane == sp - 1, S, 0), axis=1,
                          keepdims=True)
            acc = acc + jnp.where(do_pop, top, zero_col)
            sp = sp - do_pop.astype(jnp.int32)
            return S, sp, acc

        S0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        sp0 = jnp.zeros((P_SUB, 1), jnp.int32)
        acc0 = jnp.zeros((P_SUB, 1), jnp.int32)
        S, sp, acc = jax.lax.fori_loop(0, N_T, body, (S0, sp0, acc0))
        o_ref[...] = (acc + sp + S[:, 0:1]).astype(jnp.float32) * jnp.ones(
            (P_SUB, P_LANE), jnp.float32)

    fnt = jax.jit(pl.pallas_call(
        tkernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.float32),
    ))
    np.asarray(fnt())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fnt())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"p3 pointer timing: {dt*1e3:.2f} ms total, "
          f"{(dt - 0.025) / N_T * 1e9:.1f} ns/iter (floor-corrected)",
          flush=True)
    return 0 if (ok and ok_stk) else 1


def main():
    if len(sys.argv) > 1:
        sys.exit(globals()[sys.argv[1]]())
    me = os.path.abspath(__file__)
    for case in ("p1", "p2", "p3"):
        r = subprocess.run([sys.executable, "-u", me, case], timeout=600)
        print(f"== {case} rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
