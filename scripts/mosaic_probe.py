"""Isolated correctness probes for the Mosaic primitives the sub-warp
kernel leans on. Each probe is a tiny pallas_call checked against
NumPy; run on TPU to find which primitive miscompiles (all pass in
interpret mode by construction).

Usage: python scripts/mosaic_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, inputs, out_shape, expected):
    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )
    got = np.asarray(jax.jit(fn)(*inputs))
    ok = np.allclose(got, expected, rtol=1e-5, atol=1e-5)
    print(f"{name:28s}: {'OK' if ok else 'FAIL'}"
          + ("" if ok else f"  (max|diff| {np.abs(got - expected).max()})"), flush=True)
    if not ok:
        bad = np.argwhere(~np.isclose(got, expected, rtol=1e-5, atol=1e-5))
        print("   first bad idx:", bad[:4].tolist(),
              "got", got[tuple(bad[0])], "want", expected[tuple(bad[0])], flush=True)
    return ok


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    xj = jnp.asarray(x)

    # 1. Sublane-column slice (8,1) broadcast against (8,128).
    def k_colbcast(in_ref, o_ref):
        v = in_ref[...]
        col = v[:, 3:4]                     # (8,1)
        o_ref[...] = v * col

    run("colslice (8,1) broadcast", k_colbcast, [xj],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), x * x[:, 3:4])

    # 2. Lane-axis sum keepdims -> (8,1), then broadcast back.
    def k_lanesum(in_ref, o_ref):
        v = in_ref[...]
        s = jnp.sum(v, axis=1, keepdims=True)   # (8,1)
        o_ref[...] = v + s

    run("lane-sum keepdims", k_lanesum, [xj],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), x + x.sum(axis=1, keepdims=True))

    # 3. Packed int lane-sum + per-sublane scalar extraction.
    b = (x > 0).astype(np.int32)
    c = (x < -0.5).astype(np.int32)

    def k_packsum(in_ref, o_ref):
        v = in_ref[...]
        hk0 = v > 0
        hk1 = v < -0.5
        pa = jnp.sum(hk0.astype(jnp.int32) + (hk1.astype(jnp.int32) << 16),
                     axis=1, keepdims=True)     # (8,1)
        acc = jnp.zeros((8, 128), jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        for s in range(8):
            a01 = pa[s, 0]
            lo = a01 & 0xFFFF
            hi = a01 >> 16
            acc = jnp.where(rows == s, lo * 1000 + hi, acc)
        o_ref[...] = acc

    exp = (b.sum(1) * 1000 + c.sum(1))[:, None] * np.ones((1, 128), np.int32)
    run("packed sum + extract[s,0]", k_packsum, [xj],
        jax.ShapeDtypeStruct((8, 128), jnp.int32), exp)

    # 4. Row replication via concatenate, then (8,1) slices.
    def k_concat(in_ref, o_ref):
        row = in_ref[0:1]                   # (1,128)
        rep = jnp.concatenate([row] * 8, axis=0)   # (8,128)
        o_ref[...] = rep * rep[:, 5:6]

    run("concat-replicate row", k_concat, [xj],
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        np.broadcast_to(x[0:1], (8, 128)) * x[0, 5])

    # 5. Bitcast of an odd-lane-offset slice (ids at lanes 9:11 of a
    #    16-stride record).
    iv = rng.integers(0, 1 << 20, size=(8, 128)).astype(np.int32)
    fv = iv.view(np.float32)

    def k_bitcast(in_ref, o_ref):
        v = in_ref[...]
        rec = v[:, 16:32]                   # (8,16) static slice
        ids = jax.lax.bitcast_convert_type(rec[:, 9:11], jnp.int32)  # (8,2)
        o_ref[...] = jnp.broadcast_to(ids[:, 0:1], (8, 128)) + 0 * jnp.broadcast_to(
            ids[:, 1:2], (8, 128))

    run("bitcast odd-offset slice", k_bitcast, [jnp.asarray(fv)],
        jax.ShapeDtypeStruct((8, 128), jnp.int32),
        np.broadcast_to(iv[:, 25:26], (8, 128)))

    # 6. Scalar extraction from arbitrary sublane feeding SMEM control.
    def k_extract_smem(in_ref, o_ref):
        def scoped(sm):
            v = in_ref[...]
            for s in range(8):
                sm[s] = jnp.int32(v[s, 7] > 0)
            acc = jnp.zeros((8, 128), jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            for s in range(8):
                acc = jnp.where(rows == s, sm[s], acc)
            o_ref[...] = acc

        pl.run_scoped(scoped, pltpu.SMEM((8,), jnp.int32))

    run("extract[s,7] via SMEM", k_extract_smem, [xj],
        jax.ShapeDtypeStruct((8, 128), jnp.int32),
        np.broadcast_to((x[:, 7:8] > 0).astype(np.int32), (8, 128)))

    # 7. Dynamic row load with per-sublane-varying index values used
    #    inside a fori_loop (the fetch pattern).
    tab = rng.normal(size=(64, 128)).astype(np.float32)

    def k_dynload(tab_ref, idx_ref, o_ref):
        def scoped(sm):
            v = idx_ref[...]
            for s in range(8):
                sm[s] = v[s, 0]
            rows = [tab_ref[pl.ds(sm[s], 1)] for s in range(8)]
            o_ref[...] = jnp.concatenate(rows, axis=0)

        pl.run_scoped(scoped, pltpu.SMEM((8,), jnp.int32))

    idx = rng.integers(0, 64, size=(8, 128)).astype(np.int32)
    run("8x dynamic row loads", k_dynload, [jnp.asarray(tab), jnp.asarray(idx)],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), tab[idx[:, 0]])


if __name__ == "__main__":
    main()
