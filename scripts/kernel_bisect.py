"""On-chip bisect of the FAILED_PRECONDITION dispatch failure.

Runs the REAL traversal kernel in increasingly heavy configurations and
reports pass/fail per stage, to distinguish:
  * table size (tiny Cornell-box-only BVH vs full bunny BVH),
  * packet count (1 vs 2 vs chunked),
  * the brute pre-pass rows,
  * SMEM stack capacity.

Each stage is a separate jit cache entry; failures are caught and the
script continues (dispatch failures have not wedged the process in past
episodes — if the tunnel dies, rerun).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scene.builder import reference_scene
from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas


def rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32))
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=1, keepdims=True))
    return o, d


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"PASS {name}: {out} ({time.time()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        print(f"FAIL {name}: {type(e).__name__}: {msg} ({time.time()-t0:.1f}s)",
              flush=True)
        return False


def trace_mean(scene, n):
    o, d = rays(n)
    rc = trace_closest_pallas(o, d, scene.bvh4, 3e38, sort=False, interpret=False)
    t = np.asarray(rc["t"])
    hit = np.asarray(rc["hit"])
    return f"hit={int(hit.sum())}/{n} mean_t={float(t[hit].mean()):.4f}"


def main():
    print(f"devices: {jax.devices()}", flush=True)

    tiny = reference_scene(assets_dir="assets/models", with_bunny=False,
                           build_bvh=True)
    stage("tiny-scene 1 packet (1024 rays)", lambda: trace_mean(tiny, 1024))
    stage("tiny-scene 2 packets (2048 rays)", lambda: trace_mean(tiny, 2048))

    full = reference_scene(assets_dir="assets/models", build_bvh=True)
    nrows = full.bvh4.bounds.shape[0]
    print(f"full scene: {full.bvh4.tri.shape[0]} tris, {nrows} nodes, "
          f"stack_depth={full.bvh4.stack_depth}", flush=True)
    stage("full-scene 1 packet (1024 rays)", lambda: trace_mean(full, 1024))
    stage("full-scene 2 packets (2048 rays)", lambda: trace_mean(full, 2048))
    stage("full-scene 16 packets", lambda: trace_mean(full, 16 * 1024))


if __name__ == "__main__":
    main()
