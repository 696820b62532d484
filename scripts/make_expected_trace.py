"""Generate /tmp/expected_trace.npz — the CPU-exact traversal result for
the fixed probe ray set used by scripts/tpu_recover_*.sh.

Runs the Pallas kernel in interpret mode on CPU (which is equivalence-
tested against all other backends), so the on-chip compiled kernel can
be validated against it before any bench number is trusted.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.scene.builder import reference_scene
from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas


def main(out="/tmp/expected_trace.npz"):
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    rng = np.random.default_rng(3)
    n = 2048
    o = jnp.asarray(rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32))
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=1, keepdims=True))
    rc = trace_closest_pallas(o, d, scene.bvh4, 3e38, sort=False, interpret=True)
    np.savez(
        out,
        t=np.asarray(rc["t"]),
        tri=np.asarray(rc["tri_id"]),
        mat=np.asarray(rc["mat_id"]),
        hit=np.asarray(rc["hit"]),
        normal=np.asarray(rc["normal"]),
    )
    print(f"wrote {out}: hit={int(np.asarray(rc['hit']).sum())}/{n} "
          f"mean_t={float(np.asarray(rc['t'])[np.asarray(rc['hit'])].mean()):.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
