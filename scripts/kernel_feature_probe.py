"""Construct-by-construct on-chip probe for the traversal-kernel
dispatch failure (FAILED_PRECONDITION wedging the device client).

Each stage adds ONE construct the real kernel uses beyond what
scripts/mosaic_probe.py already verified. A dispatch fault kills the
process, so the driver mode runs every stage in a fresh subprocess:

    python scripts/kernel_feature_probe.py          # driver: all stages
    python scripts/kernel_feature_probe.py s3       # one stage, in-process
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

STAGES = ["s1", "s2", "s3", "s4", "s5", "s6", "s7"]


def _setup():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, np, pl, pltpu


def s1():
    """Multi-output (6) pallas_call + vmem_limit_bytes CompilerParams."""
    jax, jnp, np, pl, pltpu = _setup()

    def kernel(x_ref, *outs):
        v = x_ref[...]
        for i, o in enumerate(outs):
            o[...] = v + float(i)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    outs = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 6,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    ))(x)
    assert all(np.allclose(np.asarray(o), np.asarray(x) + i)
               for i, o in enumerate(outs))
    return "6 outputs + vmem_limit ok"


def s2():
    """fori_loop over packets with pl.ds(p,1) input reads/output writes."""
    jax, jnp, np, pl, pltpu = _setup()

    g = 4

    def kernel(x_ref, o_ref):
        def body(p, _):
            o_ref[pl.ds(p, 1)] = x_ref[pl.ds(p, 1)] * 2.0
            return 0

        jax.lax.fori_loop(0, g, body, 0)

    x = jnp.arange(g * 8 * 128, dtype=jnp.float32).reshape(g, 8, 128)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
    ))(x)
    assert np.allclose(np.asarray(out), np.asarray(x) * 2.0)
    return "packet fori_loop ok"


def s3():
    """while_loop with (scalar, vreg) carry whose trip count is
    input-dependent (the traversal loop shape)."""
    jax, jnp, np, pl, pltpu = _setup()

    def kernel(x_ref, n_ref, o_ref):
        v = x_ref[...]
        n = n_ref[0]

        def cond(c):
            return c[0] > 0

        def body(c):
            i, acc = c
            return i - 1, acc + v

        _, acc = jax.lax.while_loop(cond, body, (n, jnp.zeros((8, 128), jnp.float32)))
        o_ref[...] = acc

    x = jnp.ones((8, 128), jnp.float32)
    n = jnp.asarray([7], jnp.int32)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))(x, n)
    assert np.allclose(np.asarray(out), 7.0)
    return "data-dependent while_loop ok"


def s4():
    """run_scoped SMEM mutated INSIDE a while_loop body (task/sp refs)."""
    jax, jnp, np, pl, pltpu = _setup()

    def kernel(x_ref, o_ref):
        def scoped(task_ref):
            for s in range(8):
                task_ref[s] = jnp.int32(s + 3)

            def cond(c):
                return c[0] > 0

            def body(c):
                n, acc = c
                na = jnp.int32(0)
                for s in range(8):
                    t = task_ref[s]
                    task_ref[s] = t - 1
                    na += (t > 1).astype(jnp.int32)
                return na, acc + x_ref[...]

            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(8), jnp.zeros((8, 128), jnp.float32)))
            o_ref[...] = acc

        pl.run_scoped(scoped, pltpu.SMEM((8,), jnp.int32))

    x = jnp.ones((8, 128), jnp.float32)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))(x)
    # tasks 3..10 decrement each iter; loop runs until all <=1 from the
    # n_alive counter: iterations = 10 (task 10 needs 9 decrements; count
    # reaches 0 the iteration after). Expected = number of iterations.
    assert float(np.asarray(out)[0, 0]) > 0
    return f"SMEM-in-while ok (iters={float(np.asarray(out)[0, 0])})"


def s5():
    """DYNAMIC-index SMEM stores + loads (the stack push/pop pattern)."""
    jax, jnp, np, pl, pltpu = _setup()

    def kernel(x_ref, o_ref):
        def scoped(sp_ref, stack_ref):
            sp_ref[0] = jnp.int32(0)

            def body(i, acc):
                sp = sp_ref[0]
                # push i at dynamic position sp, sometimes 2 entries
                stack_ref[sp] = i
                stack_ref[sp + jnp.where(i % 2 == 0, 1, 0)] = i * 10
                sp_ref[0] = sp + jnp.where(i % 2 == 0, 2, 1)
                return acc

            acc = jax.lax.fori_loop(0, 16, body, jnp.zeros((8, 128), jnp.float32))

            def body2(i, acc):
                sp = sp_ref[0]
                v = stack_ref[jnp.maximum(sp - 1, 0)]
                sp_ref[0] = sp - 1
                return acc + v.astype(jnp.float32)

            acc = jax.lax.fori_loop(0, 8, body2, acc)
            o_ref[...] = acc + 0.0 * x_ref[...]

        pl.run_scoped(scoped, pltpu.SMEM((1,), jnp.int32),
                      pltpu.SMEM((64,), jnp.int32))

    x = jnp.ones((8, 128), jnp.float32)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))(x)
    assert np.isfinite(np.asarray(out)).all()
    return f"dynamic SMEM store/load ok (val={float(np.asarray(out)[0, 0])})"


def s6():
    """Dynamic VMEM row load whose index comes from SMEM, inside a
    while_loop (the node-fetch pattern), plus the select-record chain."""
    jax, jnp, np, pl, pltpu = _setup()

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(tab_ref, o_ref):
        def scoped(task_ref):
            for s in range(8):
                task_ref[s] = jnp.int32(5 * s % 17)

            def cond(c):
                return c[0] > 0

            def body(c):
                n, acc = c
                rows = []
                for s in range(8):
                    t = task_ref[s]
                    row = tab_ref[pl.ds(jnp.where(t >= 0, t % 16, 0), 1)]
                    rec = row[:, 0:32]
                    for q in range(1, 4):
                        rec = jnp.where((t % 4) == q, row[:, q * 32:(q + 1) * 32], rec)
                    rows.append(rec)
                    task_ref[s] = t - 1
                r8 = jnp.concatenate(rows, axis=0)  # (8,32)
                acc = acc + jnp.concatenate([r8, r8, r8, r8], axis=1)
                return n - 1, acc

            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(6), jnp.zeros((8, 128), jnp.float32)))
            o_ref[...] = acc

        pl.run_scoped(scoped, pltpu.SMEM((8,), jnp.int32))

    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))(tab)
    assert np.isfinite(np.asarray(out)).all()
    return "dynamic fetch + select chain in while ok"


def s7():
    """The real kernel on the tiny (box-only) scene — known failure as of
    2026-08-18; if this passes the service has healed."""
    jax, jnp, np, pl, pltpu = _setup()
    from raytracer_tpu.scene.builder import reference_scene
    from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas

    scene = reference_scene(assets_dir="assets/models", with_bunny=False,
                            build_bvh=True)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-0.28, 0.28, (1024, 3)).astype(np.float32))
    dd = rng.normal(size=(1024, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=1, keepdims=True))
    rc = trace_closest_pallas(o, d, scene.bvh4, 3e38, sort=False, interpret=False)
    hit = int(np.asarray(rc["hit"]).sum())
    return f"real kernel tiny scene ok (hit={hit}/1024)"


def driver():
    results = {}
    for st in STAGES:
        p = subprocess.run(
            [sys.executable, "-u", __file__, st],
            capture_output=True, text=True, timeout=560)
        line = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
        err = (p.stderr.strip().splitlines() or [""])[-1]
        status = "PASS" if p.returncode == 0 else "FAIL"
        results[st] = status
        print(f"{status} {st}: {line if p.returncode == 0 else err[:160]}",
              flush=True)
    print(results)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        fn = globals()[sys.argv[1]]
        print(fn(), flush=True)
    else:
        driver()
