"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "camera_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R}

Workload: the reference's headline scene — Cornell box + bunny-scale
mesh (~82k tris) at 2K (2560×1440), camera INSIDE the box matching the
reference's published screenshot (every pixel hits geometry, paths only
terminate via the ceiling light / RR / 20-bounce cap), traced with the
wavefront integrator over the two-level native SAH BVH4 — the same
geometry/shading work per camera ray as the reference's "high quality"
mode (README.md:11: 2K/2000spp "takes several minutes" on an RTX 3050
Ti ⇒ ~12-41 M camera rays/s; BASELINE.md). Per-ray cost is
spp-invariant, so we time a fixed spp slice and report camera
rays/second/chip. vs_baseline is against the 25 M rays/s midpoint of
the reference estimate.
"""

from __future__ import annotations

import json
import sys
import time

import jax

BASELINE_RAYS_PER_SEC = 25.0e6  # BASELINE.md derived midpoint (12-41 M)


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import render_image_wavefront
    from raytracer_tpu.scene.builder import reference_scene

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    if on_accel:
        width, height, spp, bounces = 2560, 1440, 8, 20
    else:  # CPU smoke fallback (just proves the harness runs)
        width, height, spp, bounces = 64, 36, 1, 2

    # spp_per_pass keeps each device dispatch short (the tunnel kills
    # multi-second dispatches occasionally).
    cfg = RenderConfig(width=width, height=height, spp=spp, max_bounces=bounces,
                       spp_per_pass=2)
    if on_accel:
        scene = reference_scene(assets_dir="assets/models", build_bvh=True)
        jax.block_until_ready(scene.bvh4.bounds)
    else:
        from raytracer_tpu.scene.builder import cornell_spheres_scene

        scene = cornell_spheres_scene()
    # Interior framing matching the reference's published screenshot:
    # every pixel hits geometry (no free sky rays inflating rays/s).
    cam = showcase_camera(cfg)

    if on_accel:
        def render(key):
            return render_image_wavefront(scene, cam, cfg, key)
    else:
        from raytracer_tpu.render import render_image

        def render(key):
            return render_image(scene, cam, cfg, key)

    # Warmup / compile, then timed runs (materialize a scalar to defeat
    # any async-dispatch timing artifacts through the device tunnel).
    # The tunnel occasionally drops a dispatch (UNAVAILABLE/ABORTED);
    # retry transient failures a few times before giving up.
    for attempt in range(4):
        try:
            float(render(jax.random.key(0)).mean())
            break
        except Exception as e:  # pragma: no cover - tunnel flake path
            if attempt == 3:
                raise
            print(f"# warmup attempt {attempt} failed ({type(e).__name__}); "
                  f"retrying in 60s", file=sys.stderr)
            time.sleep(60)
    times = []
    i = 0
    while len(times) < 3 and i < 8:
        i += 1
        try:
            t0 = time.perf_counter()
            m = float(render(jax.random.key(i)).mean())
            times.append(time.perf_counter() - t0)
        except Exception as e:  # pragma: no cover - tunnel flake path
            print(f"# timed run {i} failed ({type(e).__name__}); retrying",
                  file=sys.stderr)
            time.sleep(30)
    dt = min(times)

    camera_rays = width * height * spp
    rays_per_sec = camera_rays / dt

    print(
        f"# platform={platform} {width}x{height} spp={spp} bounces={bounces} "
        f"best={dt:.3f}s times={['%.3f' % t for t in times]} mean_rgb={m:.4f}",
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
