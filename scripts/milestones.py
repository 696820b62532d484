"""Render the five BASELINE.json milestone configs and write results.

Usage: python scripts/milestones.py [--out renders/] [--quick]

  (1) cornell_spheres_256   — analytic spheres, CPU-runnable golden config
  (2) cornell_materials_512 — Cornell triangles + all four material types
  (3) bunny_1080p           — ~82k-tri mesh through the SAH BVH4
  (4) inverse_render        — recover perturbed materials from a target
  (5) reference_2k          — the full reference workload (resumable)

Each render writes a PNG + a JSON stats line; the inverse-render config
writes a loss curve. `--quick` drops spp for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import json
import os
import sys
import time

import jax
import numpy as np


def main():
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    from raytracer_tpu.camera import make_camera
    from raytracer_tpu.config import PRESETS
    from raytracer_tpu.diff import inverse
    from raytracer_tpu.models.wavefront import render_image_wavefront
    from raytracer_tpu.ops.tonemap import to_rgba8
    from raytracer_tpu.render import render_image
    from raytracer_tpu.scene import builder
    from raytracer_tpu.utils.image import write_png

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="renders")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None, help="comma-separated subset 1-5")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    only = set(int(x) for x in args.only.split(",")) if args.only else {1, 2, 3, 4, 5}

    def cam_for(cfg, showcase=True):
        kw = dict(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                  aperture=cfg.aperture)
        if showcase:
            kw.update(position=(0.0, 0.05, 0.29), pitch=-5.0)
        return make_camera(**kw)

    def emit(name, cfg, img, dt):
        path = os.path.join(args.out, f"{name}.png")
        write_png(path, np.asarray(to_rgba8(img)))
        rays = cfg.width * cfg.height * cfg.spp
        rec = {"config": name, "size": [cfg.width, cfg.height], "spp": cfg.spp,
               "seconds": round(dt, 3), "mrays_per_sec": round(rays / dt / 1e6, 2),
               "mean_rgb": [round(float(x), 5) for x in np.asarray(img).mean((0, 1))]}
        print(json.dumps(rec))
        return rec

    results = []
    if 1 in only:
        cfg = PRESETS["cornell_spheres_256"]
        if args.quick:
            cfg = cfg.replace(spp=4)
        scene = builder.cornell_spheres_scene()
        cam = make_camera(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                          aperture=cfg.aperture)
        t0 = time.perf_counter()
        img = render_image_wavefront(scene, cam, cfg, jax.random.key(1))
        img.block_until_ready()
        results.append(emit("1_cornell_spheres", cfg, img, time.perf_counter() - t0))

    if 2 in only:
        cfg = PRESETS["cornell_materials_512"]
        if args.quick:
            cfg = cfg.replace(spp=8)
        scene = builder.cornell_materials_scene()
        scene = scene.replace(bvh4=builder.build_scene_bvh4(scene.mesh))
        t0 = time.perf_counter()
        img = render_image_wavefront(scene, cam_for(cfg), cfg, jax.random.key(2))
        img.block_until_ready()
        results.append(emit("2_cornell_materials", cfg, img, time.perf_counter() - t0))

    if 3 in only:
        cfg = PRESETS["bunny_1080p"]
        if args.quick:
            cfg = cfg.replace(spp=8)
        scene = builder.reference_scene(build_bvh=True)
        t0 = time.perf_counter()
        img = render_image_wavefront(scene, cam_for(cfg), cfg, jax.random.key(3))
        img.block_until_ready()
        results.append(emit("3_bunny_1080p", cfg, img, time.perf_counter() - t0))

    if 4 in only:
        cfg = PRESETS["inverse_render"]
        steps = 10 if args.quick else 60
        scene = builder.cornell_spheres_scene()
        cam = make_camera(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                          aperture=cfg.aperture)
        target = render_image(scene, cam, cfg, jax.random.key(40))
        params = inverse.init_params(scene, fields=("albedo", "emission"),
                                     key=jax.random.key(41), noise=0.15)
        state = inverse.adam_init(params)
        step = inverse.make_train_step(scene, cam, cfg, target, lr=0.03)
        losses = []
        t0 = time.perf_counter()
        for i in range(steps):
            params, state, loss = step(params, state, jax.random.key(100 + i))
            losses.append(float(loss))
        dt = time.perf_counter() - t0
        rec = {"config": "4_inverse_render", "steps": steps, "seconds": round(dt, 2),
               "loss_first": round(losses[0], 6), "loss_last": round(losses[-1], 6)}
        print(json.dumps(rec))
        with open(os.path.join(args.out, "4_inverse_losses.json"), "w") as f:
            json.dump(losses, f)
        results.append(rec)

    if 5 in only:
        cfg = PRESETS["reference_2k"]
        if args.quick:
            cfg = cfg.replace(spp=8)
        scene = builder.reference_scene(build_bvh=True)
        from raytracer_tpu.io.checkpoint import render_image_resumable

        t0 = time.perf_counter()
        img = render_image_resumable(scene, cam_for(cfg), cfg, jax.random.key(5),
                                     os.path.join(args.out, "5_reference_2k.ckpt.npz"))
        results.append(emit("5_reference_2k", cfg, img, time.perf_counter() - t0))

    with open(os.path.join(args.out, "milestones.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
