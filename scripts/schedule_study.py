"""On-chip A/B of profile-guided pixel scheduling (round 4 lever #1).

Measures the 2K/spp8/mb20 bench frame under several pixel→packet
schedules, all through the SAME compiled fused kernel (px/py are jit
arguments):
  * tile      — the production 8x128 screen-tile order (baseline)
  * rowsort   — whole 128-lane rows regrouped by profiled cost (isolates
                lockstep balancing; row content unchanged)
  * bucketN   — (cost-quantile bucket, Morton) pixel order for N buckets
  * puresort  — pure cost sort (locality destroyed; shows the coherence
                penalty bound)

Per-pixel radiance is bit-identical across schedules (pixel-keyed RNG),
asserted on the frame mean. Usage: python scripts/schedule_study.py
[spp] [repeats]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import numpy as np

SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    from raytracer_tpu import schedule
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
    from raytracer_tpu.scene.builder import reference_scene

    cfg = RenderConfig(width=2560, height=1440, spp=SPP, max_bounces=20)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    cam = showcase_camera(cfg)
    key = jax.random.key(0)
    px, py, _ = _tiled_pixel_grid(cfg)
    n_rays = cfg.width * cfg.height * SPP

    def timed(pxa, pya):
        ts = []
        m = 0.0
        for i in range(REPEATS):
            t0 = time.perf_counter()
            rgb = render_tiles_fused(scene, cam, cfg, key, pxa, pya, spp=SPP)
            m = float(rgb.mean())
            ts.append(time.perf_counter() - t0)
        return min(ts), m

    # Warm the production kernel (compile; cached across runs).
    t0 = time.perf_counter()
    base_t, base_m = timed(px, py)
    print(f"# warm+baseline {time.perf_counter()-t0:.1f}s "
          f"baseline={base_t:.3f}s mean={base_m:.5f}", flush=True)

    # Profile pass (separate compile: the instrumented kernel).
    t0 = time.perf_counter()
    _, cost = render_tiles_fused(scene, cam, cfg, key, px, py, spp=2,
                                 profile=True)
    cost = np.asarray(cost)
    t_prof = time.perf_counter() - t0
    rows = cost.reshape(-1, 128).mean(axis=1)
    pk = rows.reshape(-1, 8)
    print(f"# profile pass {t_prof:.1f}s cost/lane mean={cost.mean():.1f} "
          f"p50={np.median(cost):.0f} p99={np.quantile(cost, 0.99):.0f} "
          f"packet max/mean={pk.max(axis=1).mean()/max(pk.mean(),1e-9):.3f}",
          flush=True)

    out = {"config": f"2560x1440 spp{SPP} mb20 showcase", "repeats": REPEATS,
           "baseline_s": round(base_t, 3),
           "baseline_mrays": round(n_rays / base_t / 1e6, 3),
           "profile_pass_s": round(t_prof, 2),
           "variants": {}}

    variants = [("rowsort", None)] + [
        (f"bucket{n}", n) for n in (8, 32, 128)] + [("puresort", 1 << 20)]
    for name, nb in variants:
        if name == "rowsort":
            px2, py2, _ = schedule.order_by_row_cost(px, py, cost)
        else:
            px2, py2, _ = schedule.order_by_cost(px, py, cost, cfg,
                                                 n_buckets=nb)
        t, m = timed(px2, py2)
        ok = abs(m - base_m) < 1e-5
        print(f"# {name:9s} {t:7.3f}s  {n_rays/t/1e6:6.2f} Mrays/s  "
              f"x{base_t/t:5.2f}  mean={m:.5f} {'OK' if ok else 'MISMATCH'}",
              flush=True)
        out["variants"][name] = {
            "s": round(t, 3), "mrays": round(n_rays / t / 1e6, 3),
            "speedup": round(base_t / t, 3), "mean_ok": ok}

    print(json.dumps(out, indent=1))
    with open("SCHEDULE_STUDY.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
