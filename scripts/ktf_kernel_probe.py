"""Probe: the int32 vector ops utils/ktf.py needs inside a Mosaic kernel
(threefry2x32 = add/xor/shift rotations; u01 = logical shift + astype;
unit-vector/disk = sqrt/sin/cos transcendentals) — validated COMPILED
ON TPU against the host-side jnp implementation of the very same
functions.

Subprocess-per-case (a device fault kills the process — bitcast_probe.py
pattern): `python scripts/ktf_kernel_probe.py` runs all cases, or
`python scripts/ktf_kernel_probe.py <case>` runs one in-process.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

CASES = ["intops", "threefry", "u01", "unitvec", "sampler_tile"]


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytracer_tpu.utils import ktf

    rng = np.random.default_rng(7)
    i32 = lambda shape: rng.integers(-2**31, 2**31, size=shape, dtype=np.int64).astype(np.int32)

    def pcall(kernel, inputs, out_shapes):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes),
            out_shape=out_shapes,
        )(*inputs)

    if case == "intops":
        a, b = i32((8, 128)), i32((8, 128))

        def k(a_ref, b_ref, o1, o2, o3, o4):
            x, y = a_ref[...], b_ref[...]
            o1[...] = x + y
            o2[...] = x ^ y
            o3[...] = jax.lax.shift_left(x, jnp.int32(13)) | jax.lax.shift_right_logical(
                x, jnp.int32(19))
            o4[...] = jax.lax.shift_right_logical(x, jnp.int32(9))

        outs = pcall(k, [jnp.asarray(a), jnp.asarray(b)],
                     [jax.ShapeDtypeStruct((8, 128), jnp.int32)] * 4)
        ua = a.view(np.uint32)
        exp = [
            (ua + b.view(np.uint32)).astype(np.uint32),
            (ua ^ b.view(np.uint32)),
            ((ua << 13) | (ua >> 19)),
            (ua >> 9),
        ]
        for got, want, name in zip(outs, exp, ["add", "xor", "rotl13", "shr9"]):
            ok = (np.asarray(got).view(np.uint32) == want).all()
            print(f"  {name}: {'OK' if ok else 'FAIL'}", flush=True)
            assert ok, name

    elif case == "threefry":
        k0, k1 = np.int32(0x1234ABCD - 2**31), np.int32(77)
        c0, c1 = i32((8, 128)), i32((8, 128))

        def k(c0_ref, c1_ref, o0, o1):
            x0, x1 = ktf.threefry2x32(k0, k1, c0_ref[...], c1_ref[...])
            o0[...] = x0
            o1[...] = x1

        g0, g1 = pcall(k, [jnp.asarray(c0), jnp.asarray(c1)],
                       [jax.ShapeDtypeStruct((8, 128), jnp.int32)] * 2)
        e0, e1 = ktf.threefry2x32(k0, k1, jnp.asarray(c0), jnp.asarray(c1))
        ok = (np.asarray(g0) == np.asarray(e0)).all() and (np.asarray(g1) == np.asarray(e1)).all()
        print(f"  threefry2x32 in-kernel == host: {'OK' if ok else 'FAIL'}", flush=True)
        assert ok

    elif case == "u01":
        bits = i32((8, 128))

        def k(b_ref, o):
            o[...] = ktf.u01(b_ref[...])

        (got,) = pcall(k, [jnp.asarray(bits)], [jax.ShapeDtypeStruct((8, 128), jnp.float32)])
        want = np.asarray(ktf.u01(jnp.asarray(bits)))
        ok = (np.asarray(got) == want).all()
        print(f"  u01 in-kernel == host (bitwise): {'OK' if ok else 'FAIL'}", flush=True)
        assert ok

    elif case == "unitvec":
        bits = i32((2, 8, 128))

        def k(b_ref, ox, oy, oz):
            u1 = ktf.u01(b_ref[0])
            u2 = ktf.u01(b_ref[1])
            z = 1.0 - 2.0 * u1
            r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            phi = jnp.float32(2.0 * np.pi) * u2
            ox[...] = r * jnp.cos(phi)
            oy[...] = r * jnp.sin(phi)
            oz[...] = z

        gx, gy, gz = pcall(k, [jnp.asarray(bits)],
                           [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 3)
        u1 = np.asarray(ktf.u01(jnp.asarray(bits[0])))
        u2 = np.asarray(ktf.u01(jnp.asarray(bits[1])))
        z = 1.0 - 2.0 * u1
        r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
        ex, ey = r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)
        ok = (np.allclose(np.asarray(gx), ex, atol=1e-5)
              and np.allclose(np.asarray(gy), ey, atol=1e-5)
              and np.allclose(np.asarray(gz), z, atol=1e-6))
        n = np.sqrt(np.asarray(gx) ** 2 + np.asarray(gy) ** 2 + np.asarray(gz) ** 2)
        print(f"  unit-vector transcendentals: {'OK' if ok else 'FAIL'} "
              f"(|v| in [{n.min():.6f},{n.max():.6f}])", flush=True)
        assert ok

    elif case == "sampler_tile":
        # The megakernel's actual draw pattern: per-tile pixel ids +
        # scalar-per-chain sample/bounce words, full sampler methods.
        pix = jnp.asarray(i32((8, 128)) & 0x3FFFFF)
        key = jax.random.key(9)
        kw0, kw1 = ktf.key_words(key)
        kw0 = jnp.asarray([[int(kw0)]], jnp.int32)
        kw1 = jnp.asarray([[int(kw1)]], jnp.int32)

        def k(pix_ref, k0_ref, k1_ref, o_rr, o_ux, o_uy, o_uz):
            smp = ktf.KtfSampler(k0=k0_ref[0, 0], k1=k1_ref[0, 0],
                                 pixel=pix_ref[...],
                                 sample=jnp.int32(5), bounce=jnp.int32(2))
            o_rr[...] = smp.rr_uniform()
            ux, uy, uz = smp.unit_vector_parts(ktf.SCATTER)
            o_ux[...] = ux
            o_uy[...] = uy
            o_uz[...] = uz

        got = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 4,
        )(pix, kw0, kw1)
        smp = ktf.sampler(key, pix, sample=5, bounce=2)
        want_rr = np.asarray(smp.rr_uniform())
        wx, wy, wz = (np.asarray(v) for v in smp.unit_vector_parts(ktf.SCATTER))
        ok = ((np.asarray(got[0]) == want_rr).all()
              and np.allclose(np.asarray(got[1]), wx, atol=1e-5)
              and np.allclose(np.asarray(got[2]), wy, atol=1e-5)
              and np.allclose(np.asarray(got[3]), wz, atol=1e-6))
        print(f"  sampler-on-tile == host sampler: {'OK' if ok else 'FAIL'}", flush=True)
        assert ok

    else:
        raise SystemExit(f"unknown case {case}")


def main():
    fails = []
    for case in CASES:
        print(f"case {case}:", flush=True)
        r = subprocess.run([sys.executable, __file__, case], timeout=900)
        if r.returncode != 0:
            fails.append(case)
            print(f"  -> subprocess rc={r.returncode} (FAIL/crash)", flush=True)
    print(f"\n{len(CASES) - len(fails)}/{len(CASES)} cases OK; failures: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
    else:
        main()
