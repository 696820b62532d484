"""Target the on-chip int-payload corruption seen in the traversal
kernel (t updates correct, bitcast ids/child codes read as 0).

Probes, against the REAL packed scene tables:
  p1: bitcast of tri-record id lanes from a replicated brute row
  p2: int (8,1)->(8,128) broadcast select (best = where(ok, prim, best))
  p3: bitcast of node child codes via the _select_record chain
  p4: p1+p2 composed (the exact mt_record id-recording pattern)

Run each in a fresh subprocess: python scripts/bitcast_probe.py [pN]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

PROBES = ["p1", "p2", "p3", "p4"]


def _setup():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytracer_tpu.ops.pallas_traverse import (
        NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE, _pack_tables, _select_record)
    from raytracer_tpu.scene.builder import reference_scene

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    node_pack, tri_pack, n_leaf_rows, n_brute_rows = _pack_tables(
        scene.bvh4, scene.bvh4.face_mat)
    import jax as _jax
    node_pack, tri_pack = _jax.block_until_ready((node_pack, tri_pack))
    return (jax, jnp, np, pl, pltpu, NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE,
            _select_record, scene, node_pack, tri_pack, n_leaf_rows,
            n_brute_rows)


def p1():
    """Replicated brute-row record id bitcast -> out."""
    (jax, jnp, np, pl, pltpu, NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE,
     _select_record, scene, node_pack, tri_pack, n_leaf_rows,
     n_brute_rows) = _setup()

    zero_row = tri_pack.shape[0] - 1
    r0 = zero_row - n_brute_rows  # first brute row

    def kernel(tri_ref, o_ref):
        row = tri_ref[r0:r0 + 1]
        trow = jnp.concatenate([row] * P_SUB, axis=0)
        acc = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        for k in range(8):
            trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
            ids = jax.lax.bitcast_convert_type(trec[:, 9:11], jnp.int32)
            acc = jnp.where(cols == 2 * k, ids[:, 0:1], acc)
            acc = jnp.where(cols == 2 * k + 1, ids[:, 1:2], acc)
        o_ref[...] = acc

    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32),
    ))(tri_pack)
    got = np.asarray(out)[0, :16]
    prim = np.asarray(scene.bvh4.brute_prim)[:8]
    mat = np.asarray(scene.bvh4.brute_mat)[:8]
    want = np.stack([prim, mat], axis=1).reshape(-1)
    ok = (got == want).all()
    return f"{'OK' if ok else 'BAD'} got={got.tolist()} want={want.tolist()}"


def p2():
    """best = where(ok, (8,1) int broadcast, best) recording pattern."""
    (jax, jnp, np, pl, pltpu, NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE,
     _select_record, scene, node_pack, tri_pack, n_leaf_rows,
     n_brute_rows) = _setup()

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        best = jnp.full((P_SUB, P_LANE), -1, jnp.int32)
        for k in range(4):
            ok = x > float(k) * 0.5
            prim = jnp.full((P_SUB, 1), 100 + k, jnp.int32)
            best = jnp.where(ok, prim, best)
        o_ref[...] = best

    import numpy as np2
    rng = np2.random.default_rng(0)
    x = rng.normal(size=(P_SUB, P_LANE)).astype(np2.float32)
    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32),
    ))(jnp.asarray(x))
    got = np.asarray(out)
    want = np.full((P_SUB, P_LANE), -1, np.int32)
    for k in range(4):
        want = np.where(x > k * 0.5, 100 + k, want)
    ok = (got == want).all()
    return (f"{'OK' if ok else 'BAD'} diffs={int((got != want).sum())} "
            f"sample got={got[0, :6].tolist()} want={want[0, :6].tolist()}")


def p3():
    """Node child codes via the _select_record chain + bitcast."""
    (jax, jnp, np, pl, pltpu, NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE,
     _select_record, scene, node_pack, tri_pack, n_leaf_rows,
     n_brute_rows) = _setup()

    def kernel(node_ref, o_ref):
        acc = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        nrecs = []
        for s in range(P_SUB):
            task = jnp.int32(s)  # nodes 0..7
            nrow = node_ref[pl.ds(task // 4, 1)]
            nrecs.append(_select_record(nrow, task % 4, 4, NODE_STRIDE))
        nrec8 = jnp.concatenate(nrecs, axis=0)
        ch8 = jax.lax.bitcast_convert_type(nrec8[:, 24:28], jnp.int32)
        for k in range(4):
            acc = jnp.where(cols == k, ch8[:, k:k + 1], acc)
        o_ref[...] = acc

    out = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32),
    ))(node_pack)
    got = np.asarray(out)[:, :4]
    want = np.asarray(scene.bvh4.children)[:8]
    ok = (got == want).all()
    return (f"{'OK' if ok else 'BAD'} got0={got[0].tolist()} "
            f"want0={want[0].tolist()} diffs={int((got != want).sum())}/32")


def p4():
    """Exact mt_record id-record: bitcast ids + masked select update."""
    (jax, jnp, np, pl, pltpu, NODE_STRIDE, TRI_STRIDE, P_SUB, P_LANE,
     _select_record, scene, node_pack, tri_pack, n_leaf_rows,
     n_brute_rows) = _setup()

    zero_row = tri_pack.shape[0] - 1
    r0 = zero_row - n_brute_rows

    def kernel(tri_ref, o_ref, m_ref):
        row = tri_ref[r0:r0 + 1]
        trow = jnp.concatenate([row] * P_SUB, axis=0)
        best = jnp.full((P_SUB, P_LANE), -1, jnp.int32)
        mat = jnp.zeros((P_SUB, P_LANE), jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (P_SUB, P_LANE), 1)
        for k in range(8):
            trec = trow[:, k * TRI_STRIDE:(k + 1) * TRI_STRIDE]
            ids = jax.lax.bitcast_convert_type(trec[:, 9:11], jnp.int32)
            ok = (cols % 8) == k  # deterministic mask, lanes vary
            best = jnp.where(ok, ids[:, 0:1], best)
            mat = jnp.where(ok, ids[:, 1:2], mat)
        o_ref[...] = best
        m_ref[...] = mat

    out, mout = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.int32)] * 2,
    ))(tri_pack)
    got_b = np.asarray(out)[0, :8]
    got_m = np.asarray(mout)[0, :8]
    want_b = np.asarray(scene.bvh4.brute_prim)[:8]
    want_m = np.asarray(scene.bvh4.brute_mat)[:8]
    ok = (got_b == want_b).all() and (got_m == want_m).all()
    return (f"{'OK' if ok else 'BAD'} got_prim={got_b.tolist()} "
            f"want_prim={want_b.tolist()} got_mat={got_m.tolist()} "
            f"want_mat={want_m.tolist()}")


def driver():
    for name in PROBES:
        p = subprocess.run([sys.executable, "-u", __file__, name],
                           capture_output=True, text=True, timeout=560)
        line = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
        err = (p.stderr.strip().splitlines() or [""])[-1]
        status = "PASS" if p.returncode == 0 else "CRASH"
        print(f"{status} {name}: {line if p.returncode == 0 else err[:160]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(globals()[sys.argv[1]](), flush=True)
    else:
        driver()
