"""Produce SCALING_r{N}.json — rays/s and scaling efficiency at
increasing device counts (BASELINE north star: ≥85% efficiency at 2
hosts). Real multi-chip hardware is unavailable here; the 8-virtual-CPU
mesh is the measurable proxy (the sharding is the real shard_map path).

Usage: python scripts/scaling_report.py [round_tag]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def main(tag="r02"):
    from raytracer_tpu.camera import make_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.parallel import multihost
    from raytracer_tpu.scene.builder import cornell_spheres_scene

    cfg = RenderConfig(width=256, height=128, spp=8, max_bounces=6)
    scene = cornell_spheres_scene()
    cam = make_camera(aspect_ratio=cfg.width / cfg.height,
                      fov_degrees=cfg.fov_degrees, aperture=cfg.aperture,
                      position=(0.0, 0.5, 1.6), pitch=-14.0)
    rep = multihost.scaling_report(scene, cam, cfg, jax.random.key(0),
                                   device_counts=[1, 2, 4, 8])
    out = {
        "platform": "cpu-virtual-mesh",
        "note": "8 virtual CPU devices on %d physical cores - parallel "
                "speedup capped by the core count, so this measures "
                "shard_map overhead, not ICI scaling "
                "(BASELINE: >=85%% at 2 hosts)" % os.cpu_count(),
        "config": {"width": cfg.width, "height": cfg.height, "spp": cfg.spp,
                   "max_bounces": cfg.max_bounces},
        "rows": {str(c): {k: round(v, 4) for k, v in row.items()}
                 for c, row in rep.items()},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        f"SCALING_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"]))


if __name__ == "__main__":
    main(*sys.argv[1:2])
