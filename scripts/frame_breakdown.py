"""Empirical 2K frame-time breakdown on the TPU: where does the
wavefront dispatch actually spend its time?

Rows (all 2560x1440, interior showcase camera, fused Pallas path):
  spp2/mb1   — camera rays only (traversal ~1 iter/packet: brute prime
               + root reject): bounds the XLA + raygen + shade floor
  spp2/mb3   — short paths
  spp2/mb20  — production shape (bench uses 4 of these)
  spp8/mb20  — one dispatch at 4x spp: drain-tail amortization

Prints seconds + camera rays/s per row. Keep each dispatch under the
tunnel's comfort zone; rows run in sequence in ONE process.

Usage: python scripts/frame_breakdown.py [--small]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax

from raytracer_tpu.camera import showcase_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import render_image_wavefront
from raytracer_tpu.scene.builder import reference_scene


def main():
    small = "--small" in sys.argv
    w, h = (640, 360) if small else (2560, 1440)
    scene = reference_scene(assets_dir=os.path.join(
        os.path.dirname(__file__), "..", "assets", "models"), build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)

    rows = [
        ("spp2/mb1", 2, 1),
        ("spp2/mb3", 2, 3),
        ("spp2/mb20", 2, 20),
        ("spp8/mb20", 8, 20),
    ]
    for name, spp, mb in rows:
        cfg = RenderConfig(width=w, height=h, spp=spp, max_bounces=mb,
                           spp_per_pass=spp)
        cam = showcase_camera(cfg)
        img = render_image_wavefront(scene, cam, cfg, jax.random.key(0))
        jax.block_until_ready(img)  # compile
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            img = render_image_wavefront(scene, cam, cfg, jax.random.key(1 + i))
            jax.block_until_ready(img)
            best = min(best, time.perf_counter() - t0)
        rays = w * h * spp
        print(f"{name:10s}: {best:7.3f} s  {rays/best/1e6:6.2f} M rays/s  "
              f"mean={float(img.mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
