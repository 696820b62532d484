"""Probe: calibrate the Mosaic SCALAR-SIDE cost units that dominate the
traversal iteration (~110ns/chain ~= ~100 scalar ops at ~1/cycle):

  alu32     — +32 dependent scalar ALU ops per iteration (tasks chain)
  smem16    — +16 SMEM writes (dynamic addresses) per iteration
  extract8  — +8 vreg->scalar extracts ((8,8) tile, one per sublane)
  vsort     — a full masked bitonic sort-8 of an (8,8) t/code tile in
              VECTOR ops (what replaces 8 chains x 19-swap scalar sorts)
  baseline  — none of the above (same loop skeleton + vector work)

Each variant's us/iteration minus baseline calibrates that unit's cost.
All variants share ONE real (8,128) vector workload so the vector core
isn't idle (matching production conditions). Subtract the ~23-25 ms
per-dispatch floor via the baseline, not by eyeballing totals
(kernel_floor_probe.py: an EMPTY kernel costs 23 ms end-to-end).

Usage: python scripts/scalar_cost_probe.py [iters]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 403
N_PACKETS = 256
P_SUB, P_LANE = 8, 128


def make_kernel(mode: str, iters: int = ITERS):
    def kernel(o_ref, t_out_ref):
        def body_scoped(s_ref):
            def per_packet(p, _):
                x = o_ref[pl.ds(p, 1)][0]  # (8,128)

                def body(it, carry):
                    acc, sc = carry
                    # shared vector workload (~1 slab test); sc feeds the
                    # accumulator so the scalar work is NOT dead code.
                    a = acc * 1.000001 + 0.5 + sc.astype(jnp.float32) * 1e-9
                    b = jnp.minimum(a, acc)
                    c = jnp.maximum(a, b)
                    acc = jnp.where(c > acc, b, c) + 1e-7

                    if mode == "alu32":
                        t = sc
                        for _ in range(32):
                            t = (t * 3 + 1) & 0xFFFF
                        sc = t
                    elif mode == "smem16":
                        for k in range(16):
                            s_ref[(sc + k) & 63] = sc + k
                        sc = s_ref[it & 63]
                    elif mode == "extract8":
                        tile = acc[:, 0:8]
                        t = sc
                        for s in range(8):
                            t = t + tile[s, (s * 3) % 8].astype(jnp.int32)
                        sc = t & 0xFFFF
                    elif mode == "vsort":
                        t8 = acc[:, 0:8]
                        c8 = (acc[:, 8:16] * 1000).astype(jnp.int32)
                        # bitonic sort-8 network along the lane axis via
                        # static slice shuffles (19 compare-exchanges)
                        pairs = [(0, 1), (2, 3), (4, 5), (6, 7),
                                 (0, 2), (1, 3), (4, 6), (5, 7),
                                 (1, 2), (5, 6),
                                 (0, 4), (1, 5), (2, 6), (3, 7),
                                 (2, 4), (3, 5),
                                 (1, 2), (3, 4), (5, 6)]
                        cols_t = [t8[:, k:k + 1] for k in range(8)]
                        cols_c = [c8[:, k:k + 1] for k in range(8)]
                        for (i, j) in pairs:
                            sw = cols_t[i] > cols_t[j]
                            cols_t[i], cols_t[j] = (
                                jnp.where(sw, cols_t[j], cols_t[i]),
                                jnp.where(sw, cols_t[i], cols_t[j]))
                            cols_c[i], cols_c[j] = (
                                jnp.where(sw, cols_c[j], cols_c[i]),
                                jnp.where(sw, cols_c[i], cols_c[j]))
                        acc = acc + jnp.concatenate(cols_t, axis=1).sum(
                            axis=1, keepdims=True) * 1e-9
                    return acc, sc

                acc, _ = jax.lax.fori_loop(0, iters, body, (x, jnp.int32(p)))
                t_out_ref[pl.ds(p, 1)] = acc[None]
                return 0

            jax.lax.fori_loop(0, N_PACKETS, per_packet, 0)

        pl.run_scoped(body_scoped, pltpu.SMEM((64,), jnp.int32))

    return kernel


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    rng = np.random.default_rng(0)
    # Distinct input per timed call — the tunneled backend appears to
    # short-circuit repeat executions on identical buffers (scalar_cost
    # probe v1 measured 0.1 ms for a workload whose dispatch floor alone
    # is ~23 ms).
    xs = [jnp.asarray(rng.uniform(0.1, 1.0, (N_PACKETS, P_SUB, P_LANE)
                                  ).astype(np.float32)) for _ in range(4)]
    jax.block_until_ready(xs)
    res = {}
    # (mode, iters): baseline at 2x iters checks the timing actually
    # scales with in-kernel work (guards against folded loops / fake sync).
    for mode, iters in (("baseline", ITERS), ("baseline2x", 2 * ITERS),
                        ("alu32", ITERS), ("smem16", ITERS),
                        ("extract8", ITERS), ("vsort", ITERS)):
        fn = jax.jit(lambda a, m=mode.replace("2x", ""), it=iters: pl.pallas_call(
            make_kernel(m, it),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_PACKETS, P_SUB, P_LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(a))
        np.asarray(fn(xs[0]))  # compile + full sync (device_get round trip)
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            # device_get forces a REAL round trip: on this tunneled
            # backend block_until_ready alone can return in ~0.1 ms,
            # i.e. before the device has executed anything.
            float(fn(xs[1 + i])[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        per_iter = best / (N_PACKETS * iters) * 1e9
        res[mode] = per_iter
        extra = "" if "baseline" in mode else (
            f"  (+{per_iter - res['baseline']:6.1f} ns/iter over baseline)")
        print(f"{mode:9s}: {best*1e3:7.1f} ms -> {per_iter:7.1f} ns/iter{extra}",
              flush=True)


if __name__ == "__main__":
    main()
