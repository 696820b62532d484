"""BASELINE config[3] FOR REAL: inverse-render the Cornell-bunny scene's
materials on the TPU at the inverse_render preset (128x128, 32 spp) —
VERDICT r2 'Next' #5.

Recovers albedo/roughness/emission of ALL scene materials (mesh
materials included — walls, bunny, light) from a rendered target after
a 15% log-space perturbation, through the differentiable megakernel
path (detached-visibility hit ids + differentiable re-shade,
ops/intersect.py). Records the loss curve, per-field recovered-vs-true
error, and on-chip seconds/step in INVERSE_r03.json.

Usage: python scripts/inverse_tpu.py [steps] [lr]
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

FIELDS = ("albedo", "roughness", "emission")


def field_errors(scene, params):
    """Mean abs error over the IDENTIFIABLE entries of each field only:
    shading never reads a lambertian's roughness, a non-light's emission
    or a dielectric/light's albedo, so those entries have zero gradient
    by construction and would dilute the recovery metric."""
    t = np.asarray(scene.materials.type)
    used = {"albedo": (t == 0) | (t == 1), "roughness": t == 1,
            "emission": t == 3}
    errs = {}
    for f in FIELDS:
        true = np.asarray(getattr(scene.materials, f))
        rec = np.asarray(params[f])
        e = np.abs(rec - true)
        m = used[f]
        if e.ndim > m.ndim:
            m = m[:, None]
        errs[f] = float((e * m).sum() / np.maximum((m * np.ones_like(e)).sum(), 1))
    return errs


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import PRESETS
    from raytracer_tpu.diff import inverse
    from raytracer_tpu.render import render_image
    from raytracer_tpu.scene import builder

    cfg = PRESETS["inverse_render"]
    scene = builder.reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    cam = showcase_camera(cfg)

    # A "dataset" of matched (key, target) pairs: each step renders
    # with key_j against the TRUE-parameter render under the SAME key
    # (common random numbers), round-robin over j. One pair alone is
    # deterministic but overfits that key's detached discrete path
    # structure (measured plateau at loss 0.0049 with albedo error
    # still 0.11); averaging over keys keeps the exact-truth global
    # optimum while smoothing the landscape.
    n_keys = 8
    targets = []
    for j in range(n_keys):
        tg = render_image(scene, cam, cfg, jax.random.key(40 + j))
        jax.block_until_ready(tg)
        targets.append(tg)
    print(f"target mean={float(targets[0].mean()):.4f}", flush=True)

    params = inverse.init_params(scene, fields=FIELDS,
                                 key=jax.random.key(41), noise=0.15)
    err0 = field_errors(scene, params)
    state = inverse.adam_init(params)
    steps_j = [inverse.make_train_step(scene, cam, cfg, tg, lr=lr)
               for tg in targets]

    losses = []
    step_times = []
    t_all = time.perf_counter()
    for i in range(steps):
        t0 = time.perf_counter()
        j = i % n_keys
        params, state, loss = steps_j[j](params, state, jax.random.key(40 + j))
        losses.append(float(loss))  # device_get forces execution
        step_times.append(time.perf_counter() - t0)
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}: loss={losses[-1]:.6f} "
                  f"({step_times[-1]:.2f} s)", flush=True)
    wall = time.perf_counter() - t_all
    err1 = field_errors(scene, params)

    out = {
        "platform": jax.devices()[0].platform,
        "config": {"width": cfg.width, "height": cfg.height, "spp": cfg.spp,
                   "max_bounces": cfg.max_bounces},
        "scene": "reference cornell_bunny (mesh materials included)",
        "fields": list(FIELDS),
        "steps": steps,
        "lr": lr,
        "seconds_per_step": round(float(np.median(step_times[1:])), 3),
        "first_step_s_with_compile": round(step_times[0], 1),
        "wall_s": round(wall, 1),
        "loss_first": round(losses[0], 6),
        "loss_last": round(losses[-1], 6),
        "param_mean_abs_err_before": {k: round(v, 5) for k, v in err0.items()},
        "param_mean_abs_err_after": {k: round(v, 5) for k, v in err1.items()},
        "loss_curve": [round(x, 6) for x in losses],
    }
    print(json.dumps({k: v for k, v in out.items() if k != "loss_curve"},
                     indent=1))
    with open("INVERSE_r03.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
