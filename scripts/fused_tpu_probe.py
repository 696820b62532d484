"""On-chip validation + timing of the fused path-loop megakernel.

Phases (run each in its OWN process — a device fault wedges the client):
  check  — small showcase frame: fused vs wavefront(rng_impl=ktf) on the
           SAME chip, same counters → must agree to fp tolerance.
  small  — 640x360 timings (spp1/mb20, spp4/mb20): preview-scale cost.
  full   — 2560x1440 timings (spp2/mb20, spp8/mb20): bench-scale cost.

Usage: python scripts/fused_tpu_probe.py {check|small|full}
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import numpy as np

from raytracer_tpu.camera import showcase_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.fused import render_image_fused
from raytracer_tpu.models.wavefront import render_image_wavefront
from raytracer_tpu.scene.builder import reference_scene

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _scene():
    scene = reference_scene(assets_dir=ASSETS, build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    return scene


def check():
    scene = _scene()
    cfg = RenderConfig(width=256, height=40, spp=2, max_bounces=12,
                       rng_impl="ktf", spp_per_pass=2)
    cam = showcase_camera(cfg)
    key = jax.random.key(0)
    fused = np.asarray(render_image_fused(scene, cam, cfg, key))
    print(f"fused  mean={fused.mean():.6f} finite={np.isfinite(fused).all()}",
          flush=True)
    wave = np.asarray(render_image_wavefront(scene, cam, cfg, key))
    print(f"wave   mean={wave.mean():.6f}", flush=True)
    bad = np.abs(fused - wave) > (5e-4 + 2e-4 * np.abs(wave))
    print(f"diverging elements: {bad.sum()}/{bad.size} ({bad.mean():.5f})")
    print(f"mean rel err: {abs(fused.mean()-wave.mean())/max(wave.mean(),1e-9):.6f}")
    ok = np.isfinite(fused).all() and bad.mean() < 0.005
    print("CHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def _time_rows(w, h, rows):
    scene = _scene()
    for name, spp, mb in rows:
        cfg = RenderConfig(width=w, height=h, spp=spp, max_bounces=mb,
                           rng_impl="ktf", spp_per_pass=spp)
        cam = showcase_camera(cfg)
        img = render_image_fused(scene, cam, cfg, jax.random.key(0))
        float(img.mean())  # compile + execute (device_get forces)
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            img = render_image_fused(scene, cam, cfg, jax.random.key(1 + i))
            m = float(img.mean())
            best = min(best, time.perf_counter() - t0)
        rays = w * h * spp
        print(f"{name:12s}: {best:7.3f} s  {rays/best/1e6:6.2f} M rays/s  "
              f"mean={m:.4f}", flush=True)
    return 0


def small():
    return _time_rows(640, 360, [("spp1/mb20", 1, 20), ("spp4/mb20", 4, 20)])


def full():
    return _time_rows(2560, 1440, [("spp2/mb20", 2, 20), ("spp8/mb20", 8, 20)])


if __name__ == "__main__":
    sys.exit({"check": check, "small": small, "full": full}[sys.argv[1]]())
