"""One-shot TPU performance validation for the Pallas wavefront path.

Run on the TPU host: python scripts/tpu_perf.py [--quick]
Prints timing lines; safe to re-run (persistent compile cache).
Keeps every dispatch short to stay under the tunnel's tolerance.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid, render_pixels_wavefront
    from raytracer_tpu.scene.builder import reference_scene

    t0 = time.perf_counter()
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    print(f"scene build: {time.perf_counter()-t0:.1f}s  n4={scene.bvh4.bounds.shape[0]} "
          f"tris={scene.bvh4.tri.shape[0]} stack={scene.bvh4.stack_depth}", flush=True)

    base = RenderConfig(width=2560, height=1440, spp=8, max_bounces=20)
    cam = showcase_camera(base)
    px, py, inv = _tiled_pixel_grid(base)

    # Row-band sub-ranges of the tiled lane order: a band of tile-rows.
    w, h = base.width, base.height
    lanes_per_tile_row = (w // 128) * 8 * 128  # 8 image rows

    def band(r0, rows):  # r0, rows in image rows (multiples of 8)
        lo = (r0 // 8) * lanes_per_tile_row
        hi = ((r0 + rows) // 8) * lanes_per_tile_row
        return px[lo:hi], py[lo:hi]

    spp = 2 if args.quick else 8
    for sort_rays in (False, True):
        cfg = base.replace(sort_rays=sort_rays)
        run = jax.jit(
            lambda px, py, s_off, sp, cfg=cfg: render_pixels_wavefront(
                scene, cam, px, py, cfg, key=jax.random.key(0), spp=sp,
                sample_offset=s_off),
            static_argnums=(3,),
        )
        print(f"--- sort_rays={sort_rays}", flush=True)
        for name, r0 in [("top(ceiling)", 0), ("middle(pedestal)", 704),
                         ("bottom(floor)", 1304)]:
            bpx, bpy = band(r0, 128)
            n = bpx.shape[0]
            t0 = time.perf_counter()
            out = run(bpx, bpy, jnp.int32(0), spp)
            m = float(out.mean())
            warm = time.perf_counter() - t0
            best = 1e9
            for i in range(2):
                t0 = time.perf_counter()
                m = float(run(bpx, bpy, jnp.int32(i + 1), spp).mean())
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: rows=128 spp={spp} warm={warm:.1f}s best={best:.3f}s -> "
                  f"{n*spp/best/1e6:.2f} M rays/s (mean {m:.4f})", flush=True)

        # Full frame.
        t0 = time.perf_counter()
        out = run(px, py, jnp.int32(7), spp)
        m = float(out.mean())
        dt = time.perf_counter() - t0
        n = px.shape[0]
        print(f"full 2K frame: spp={spp} {dt:.2f}s -> {n*spp/dt/1e6:.2f} M rays/s "
              f"(mean {m:.4f})", flush=True)
        t0 = time.perf_counter()
        m = float(run(px, py, jnp.int32(8), spp).mean())
        dt = time.perf_counter() - t0
        print(f"full 2K frame (cached): {dt:.2f}s -> {n*spp/dt/1e6:.2f} M rays/s",
              flush=True)


def traversal_only():
    """Isolate kernel time: interior rays, repeated traversal."""
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import numpy as np

    from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas
    from raytracer_tpu.scene.builder import reference_scene

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    rng = np.random.default_rng(0)
    n = 131072  # 128 packets
    o = jax.device_put(rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32))
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d = jax.device_put((dd / np.linalg.norm(dd, axis=1, keepdims=True)).astype(np.float32))
    f = jax.jit(lambda o, d: trace_closest_pallas(o, d, scene.bvh4, 3e38, sort=False)["t"])
    t = f(o, d); t.block_until_ready()
    for i in range(3):
        t0 = time.perf_counter()
        tt = f(o, d); tt.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"traversal-only interior: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} M rays/s "
              f"(hit {float((np.asarray(tt) < 1e30).mean()):.2f})", flush=True)


if __name__ == "__main__":
    if "--trav" in sys.argv:
        traversal_only()
    else:
        main()
