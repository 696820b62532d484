"""Per-round kernel regression telemetry → KERNEL_STATS_r{N}.json
(VERDICT r1 item 8): persist the traversal microbenchmarks that perf
work steers by, so regressions are visible between rounds.

Records (on the real chip):
  - traversal-only time for 128 packets of incoherent interior rays
    (the kernel stress case; same distribution as kernel_*_probe.py)
  - traversal-only time for 128 packets of coherent showcase camera
    tiles (the cheap case — brute prime + mostly root-rejects)
  - 2K spp2/mb1 and spp2/mb20 wavefront frame times (frame_breakdown
    rows: the camera floor and the production shape)
plus offline lockstep-iteration counts from the dual-unit simulator.

Usage: python scripts/kernel_stats.py <round>   (writes KERNEL_STATS_r{N}.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    from raytracer_tpu.camera import showcase_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import (_tiled_pixel_grid,
                                                render_image_wavefront)
    from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas
    from raytracer_tpu.scene.builder import reference_scene
    from raytracer_tpu.utils import rng as rngu

    out = {"round": ROUND, "platform": jax.devices()[0].platform}
    scene = reference_scene(assets_dir=os.path.join(REPO, "assets", "models"),
                            build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    out["n_bvh4_nodes"] = int(scene.bvh4.bounds.shape[0])
    out["n_tris"] = int(scene.bvh4.tri.shape[0])
    out["stack_depth"] = int(scene.bvh4.stack_depth)

    n = 128 * 1024
    rng = np.random.default_rng(0)
    o_inc = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc = (dd / np.linalg.norm(dd, axis=1, keepdims=True)).astype(np.float32)

    cfg = RenderConfig(width=2560, height=1440, spp=2, max_bounces=20)
    cam = showcase_camera(cfg)
    px, py, _ = _tiled_pixel_grid(cfg)
    keys = rngu.lane_keys(jax.random.key(0), py[:n] * cfg.width + px[:n])
    o_cam, d_cam = generate_rays(cam, px[:n], py[:n], cfg.width, cfg.height, keys)

    def time_trav(o, d, tag):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        r = trace_closest_pallas(o, d, scene.bvh4, 3.0e38, sort=False)
        float(np.asarray(r["t"])[0])  # compile + real sync
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            r = trace_closest_pallas(o, d, scene.bvh4, 3.0e38, sort=False)
            float(np.asarray(r["t"])[0])
            best = min(best, time.perf_counter() - t0)
        out[tag] = {"ms": round(best * 1e3, 2),
                    "us_per_1024ray_packet": round(best / 128 * 1e6, 2),
                    "ns_per_ray": round(best / n * 1e9, 2)}
        print(f"{tag}: {out[tag]}", flush=True)

    time_trav(o_inc, d_inc, "trav_incoherent_128pk")
    time_trav(o_cam, d_cam, "trav_camera_128pk")

    from raytracer_tpu.models.fused import render_image_fused

    def frame_rows(render, tag, rng_impl):
        for name, spp, mb in ((f"frame_2k_spp2_mb1_{tag}", 2, 1),
                              (f"frame_2k_spp2_mb20_{tag}", 2, 20),
                              (f"frame_2k_spp8_mb20_{tag}", 8, 20)):
            c = RenderConfig(width=2560, height=1440, spp=spp, max_bounces=mb,
                             spp_per_pass=spp, rng_impl=rng_impl)
            cm = showcase_camera(c)
            img = render(scene, cm, c, jax.random.key(0))
            float(jnp.mean(img))
            best = 1e9
            m = 0.0
            for i in range(2):
                t0 = time.perf_counter()
                img = render(scene, cm, c, jax.random.key(1 + i))
                m = float(jnp.mean(img))
                best = min(best, time.perf_counter() - t0)
            out[name] = {"s": round(best, 3),
                         "mrays_per_s": round(2560 * 1440 * spp / best / 1e6, 3),
                         "mean_rgb": round(m, 5)}
            print(f"{name}: {out[name]}", flush=True)

    frame_rows(render_image_fused, "fused", "ktf")
    frame_rows(render_image_wavefront, "wave", "jax")

    path = os.path.join(REPO, f"KERNEL_STATS_r{ROUND:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
