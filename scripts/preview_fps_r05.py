"""Interactive preview, round 5 (VERDICT r4 next #3): measure FPS AND
decompose it into device compute vs tunnel round-trip, at 640x360 and
the 1280x720 target.

The r4 artifact claimed the preview loop is tunnel-RTT bound but didn't
show it. Three measurements per resolution (fused megakernel, 1 spp,
mb4 navigation preview, camera as a jit argument):

  compute   : K frames dispatched back-to-back, ONE final device_get —
              per-frame device time with dispatch pipelining, no
              per-frame host fetch;
  fetch     : per-frame host fetch (np.asarray) of an ALREADY-computed
              RGBA8 frame — the pure device->host display cost — plus a
              synchronous 4-byte scalar dispatch+fetch ping for the
              payload-independent tunnel latency;
  loop      : the real double-buffered flight loop (dispatch frame i+1,
              then fetch frame i) with the reference's WASD/mouse
              semantics — the honest FPS.

The loop rate should approach 1/max(compute, fetch) when double
buffering overlaps perfectly; the gap records scheduling overhead.
Writes PREVIEW_FPS_r05.json.

Usage: python scripts/preview_fps_r05.py [frames]
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
from raytracer_tpu.ops.tonemap import to_rgba8
from raytracer_tpu.scene.builder import reference_scene

MB = 4  # navigation preview bounce cap (r3; full-quality stills use 20)


def measure(scene, width, height, frames):
    import jax.numpy as jnp

    cfg = RenderConfig(width=width, height=height, spp=1, max_bounces=MB)
    cam = showcase_camera(cfg)
    px, py, inv = _tiled_pixel_grid(cfg)

    @jax.jit
    def frame_dev(cam_arg):
        rgb = render_tiles_fused(scene, cam_arg, cfg, jax.random.key(0),
                                 px, py, spp=1)
        return to_rgba8(rgb[inv].reshape(cfg.height, cfg.width, 3))

    @jax.jit
    def probe_scalar(x):
        return x + 1

    # Warmup: compile + flush the tunnel's slow post-compile phase.
    for _ in range(8):
        np.asarray(frame_dev(cam))

    # --- compute: K async dispatches, one final fetch. -----------------
    def compute_run():
        t0 = time.perf_counter()
        out = None
        for _ in range(frames):
            out = frame_dev(cam)  # async; queue depth hides dispatch RTT
        np.asarray(out)
        return (time.perf_counter() - t0) / frames

    compute_s = min(compute_run(), compute_run())

    # --- fetch: device->host of a finished RGBA8 frame, per frame.
    # DISTINCT output buffers each iteration: jax.Array caches its host
    # copy, so re-fetching one buffer would time a no-op after the
    # first transfer.
    @jax.jit
    def checksum(b):
        return jnp.sum(b, dtype=jnp.int32)

    def fetch_run():
        bufs = [frame_dev(cam) for _ in range(frames)]
        # Fetch a scalar REDUCTION of every buffer before the timer:
        # the data dependency guarantees each frame's compute has
        # finished (CLAUDE.md: block_until_ready has returned before
        # execution on this backend), so the timed np.asarray below is
        # pure device->host transfer.
        for b in bufs:
            int(checksum(b))
        t0 = time.perf_counter()
        for b in bufs:
            np.asarray(b)
        return (time.perf_counter() - t0) / frames

    fetch_s = min(fetch_run(), fetch_run())

    # Tunnel ping: synchronous dispatch+fetch of a 4-byte scalar — the
    # per-round-trip latency floor independent of payload size.
    float(probe_scalar(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    for i in range(frames):
        float(probe_scalar(jnp.float32(i)))
    scalar_s = (time.perf_counter() - t0) / frames

    # --- loop: real double-buffered flight (r4 semantics). -------------
    def flight():
        cam0 = cam
        smoother = camera_motion.MouseSmoother()
        t0 = time.perf_counter()
        pending = None
        for i in range(frames):
            keys = "wd" if i % 20 < 10 else "sa"
            cam0 = camera_motion.move(cam0, keys, dt=1.0 / 60.0)
            dx, dy = smoother.update(3.0 if i % 10 < 5 else -3.0, 1.0)
            cam0 = camera_motion.rotate(cam0, dx, dy)
            nxt = frame_dev(cam0)          # async dispatch
            if pending is not None:
                img = np.asarray(pending)  # display previous frame
            pending = nxt
        img = np.asarray(pending)
        dt = time.perf_counter() - t0
        assert img.dtype == np.uint8 and img.shape == (height, width, 4)
        return frames / dt

    fps = max(flight(), flight())
    return {
        "resolution": f"{width}x{height}",
        "fps_loop": round(fps, 2),
        "compute_ms_per_frame": round(compute_s * 1e3, 2),
        "fetch_rgba8_ms": round(fetch_s * 1e3, 2),
        "tunnel_ping_ms": round(scalar_s * 1e3, 2),
        "rgba8_bytes": width * height * 4,
        "bound_by": ("compute" if compute_s > fetch_s else "tunnel-fetch"),
        "ideal_double_buffered_fps": round(1.0 / max(compute_s, fetch_s), 2),
    }


def main(frames=60):
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    res = [measure(scene, 640, 360, frames), measure(scene, 1280, 720, frames)]
    out = {
        "metric": "preview_fps_1spp",
        "integrator": "fused",
        "max_bounces": MB,
        "frames": frames,
        "platform": jax.devices()[0].platform,
        "value": res[1]["fps_loop"],  # headline: the 1280x720 target
        "unit": "frames/s",
        "measurements": res,
        "note": ("compute = K back-to-back async dispatches, one fetch "
                 "(device throughput); fetch = per-frame np.asarray of a "
                 "finished RGBA8 frame (tunnel display cost); loop = real "
                 "double-buffered flight. bound_by records which term "
                 "dominates; ideal_double_buffered_fps = 1/max(compute, "
                 "fetch)."),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "PREVIEW_FPS_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:2]])
