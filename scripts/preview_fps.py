"""Interactive-mode analog: FPS of a 1-spp preview loop while the camera
flies the reference's WASD/mouse path.

The reference renders 1 spp per frame while the camera moves and 2000
spp when still, displaying through a GL texture at up to 60 FPS
(Raytracer.h:52-71, Core/Camera.cuh:52-71, README.md:11 "real time").
The TPU analog is headless: each frame applies one movement tick with
the reference's exact motion semantics (camera_motion.py), renders
1 spp through the wavefront integrator (camera is a jit ARGUMENT — no
per-frame recompiles), and fetches the frame to the host (the honest
equivalent of displaying it).

Prints one JSON line and writes PREVIEW_FPS.json at the repo root.

Usage: python scripts/preview_fps.py [width height frames]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import numpy as np

from raytracer_tpu import camera_motion
from raytracer_tpu.camera import showcase_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import _tiled_pixel_grid
from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
from raytracer_tpu.scene.builder import reference_scene


def main(width=640, height=360, frames=60):
    cfg = RenderConfig(width=width, height=height, spp=1, max_bounces=20)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    cam = showcase_camera(cfg)
    px, py, inv = _tiled_pixel_grid(cfg)
    key = jax.random.key(0)

    def frame(cam):
        # Fused path-loop megakernel: the whole 1-spp frame is one
        # dispatch (camera basis rides in a packed row ARGUMENT — no
        # per-frame recompiles).
        rgb = render_tiles_fused(scene, cam, cfg, key, px, py, spp=1)
        return np.asarray(rgb[inv])  # host fetch = the "display" step

    # Warmup / compile (one program: camera is an argument).
    frame(cam)

    # Scripted flight: strafe + mouse-look, reference semantics
    # (Core/Camera.cuh:135-157), 60 FPS-equivalent dt.
    smoother = camera_motion.MouseSmoother()
    t0 = time.perf_counter()
    for i in range(frames):
        keys = "wd" if i % 20 < 10 else "sa"
        cam = camera_motion.move(cam, keys, dt=1.0 / 60.0)
        dx, dy = smoother.update(3.0 if i % 10 < 5 else -3.0, 1.0)
        cam = camera_motion.rotate(cam, dx, dy)
        img = frame(cam)
    dt = time.perf_counter() - t0
    fps = frames / dt

    assert np.isfinite(img).all()
    out = {
        "metric": "preview_fps_1spp",
        "integrator": "fused",
        "value": round(fps, 2),
        "unit": "frames/s",
        "resolution": f"{width}x{height}",
        "frames": frames,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "PREVIEW_FPS.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
