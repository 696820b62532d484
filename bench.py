"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "camera_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R}

Workload: the reference's headline scene — Cornell box + bunny-scale
mesh (~82k tris) at 2K (2560×1440) with the LBVH wavefront pipeline —
i.e. the same geometry/shading work per camera ray as the reference's
"high quality" mode (README.md:11: 2K/2000spp "takes several minutes" on
an RTX 3050 Ti ⇒ ~12-41 M camera rays/s; BASELINE.md). We time a
fixed-ray-budget slice (per-ray cost is spp-invariant) and report camera
rays/second/chip. vs_baseline is measured against the 25 M rays/s
midpoint of the reference estimate.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 25.0e6  # BASELINE.md derived midpoint (12-41 M)


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    from raytracer_tpu.camera import make_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import render_rows
    from raytracer_tpu.scene.builder import reference_scene

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    # 2K frame in row chunks; spp chosen for a ~1-2 minute bench.
    if on_accel:
        width, height, spp, bounces = 2560, 1440, 8, 20
        chunk_rows = 180
    else:  # CPU smoke fallback
        width, height, spp, bounces = 256, 144, 2, 6
        chunk_rows = 72

    cfg = RenderConfig(width=width, height=height, spp=spp, max_bounces=bounces)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh.node_min)
    cam = make_camera(
        aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
        aperture=cfg.aperture, position=(0.0, 0.35, 1.3), pitch=-12.0,
    )

    # Warmup / compile (true 2K row slice).
    render_rows(scene, cam, cfg, 0, chunk_rows, spp, jax.random.key(0)).block_until_ready()

    n_chunks = height // chunk_rows
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = render_rows(scene, cam, cfg, i * chunk_rows, chunk_rows, spp, jax.random.key(i + 1))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    camera_rays = width * chunk_rows * n_chunks * spp
    rays_per_sec = camera_rays / dt

    print(
        f"# platform={platform} {width}x{chunk_rows}x{n_chunks}chunks spp={spp} "
        f"bounces={bounces} time={dt:.2f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "camera_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
