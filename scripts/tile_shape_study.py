"""On-chip A/B of packet/sub-warp FOOTPRINT SHAPES (round 4 lever #2).

KERNEL_STATS_r04 decomposition: traversal is 90% of the 2K frame and
the per-chain iteration count is the union of the chain's 128 rays'
node visits. The historical layout gives each sub-warp a 1×128 pixel
STRIP; this study times compact 2D blocks (e.g. 16×8) at identical
lane counts — same compiled kernel (px/py are jit args), per-pixel
bit-identical output. Also records the profile counters per variant so
the win decomposes into chain-iteration reduction vs balance.

Usage: python scripts/tile_shape_study.py [spp] [repeats]
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

# (packet_w, packet_h, sub_w, sub_h)
VARIANTS = [
    ("strip128x8", 128, 8, 128, 1),   # current production layout
    ("blk32x32_s16x8", 32, 32, 16, 8),
    ("blk32x32_s8x16", 32, 32, 8, 16),
    ("blk64x16_s16x8", 64, 16, 16, 8),
    ("blk32x32_s32x4", 32, 32, 32, 4),
    ("blk128x8_s16x8", 128, 8, 16, 8),
    ("blk16x64_s16x8", 16, 64, 16, 8),
]


def main():
    from raytracer_tpu import schedule
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
    from raytracer_tpu.scene.builder import reference_scene

    cfg = RenderConfig(width=2560, height=1440, spp=SPP, max_bounces=20)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    cam = showcase_camera(cfg)
    key = jax.random.key(0)

    out = {"config": f"2560x1440 spp{SPP} mb20 showcase", "repeats": REPEATS,
           "variants": {}}
    base_m = None
    base_t = None
    for name, pw, ph, sw, sh in VARIANTS:
        px, py, _ = schedule.blocked_pixel_grid(cfg, pw, ph, sw, sh)
        n_rays = cfg.width * cfg.height * SPP
        ts = []
        m = 0.0
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rgb = render_tiles_fused(scene, cam, cfg, key, px, py, spp=SPP)
            m = float(rgb.mean())
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        # Profile counters (instrumented kernel; one extra run).
        _, cost, aux = render_tiles_fused(scene, cam, cfg, key, px, py,
                                          spp=SPP, profile=True)
        g = px.shape[0] // 1024
        a = np.asarray(aux).reshape(g, 8, 128)
        lock = float(a[:, 0, 0].sum())
        outer = float(a[:, 1, 0].sum())
        chain = float(np.asarray(cost).reshape(g, 8, 128).min(axis=2).sum() / 8.0)
        if base_t is None:
            base_t, base_m = t, m
        ok = True  # means differ only via padded-lane sets; report only
        print(f"# {name:16s} {t:7.3f}s {n_rays/t/1e6:6.2f} Mrays/s "
              f"x{base_t/t:5.2f} lock={lock:.3e} lock/call={lock/outer:5.2f} "
              f"chain/call~{chain/outer:5.2f} mean={m:.5f}", flush=True)
        out["variants"][name] = {
            "s": round(t, 3), "mrays": round(n_rays / t / 1e6, 3),
            "speedup_vs_strip": round(base_t / t, 3),
            "lockstep_total": lock, "outer_total": outer,
            "lock_per_call": round(lock / outer, 2),
            "mean_rgb": round(m, 6)}

    print(json.dumps(out, indent=1))
    with open("TILE_SHAPE_STUDY.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
