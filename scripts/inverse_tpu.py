"""BASELINE config[3] FOR REAL: inverse-render the Cornell-bunny scene's
materials on the TPU at the inverse_render preset (128x128, 32 spp).

Round-4 estimator (VERDICT r3 next #2):
  * trains with reference_emission_quirk=False, so light-terminated
    paths carry throughput x emission gradients to every albedo on the
    path (the r3 quirk-mode run starved albedo of gradient);
  * edge_aware_lights=True: the smoothed-boundary visibility term
    (models/megakernel._edge_light_term) gives metal roughness /
    dielectric IOR / camera a nonzero gradient through the light-hit
    discontinuity (r3 roughness gradient was exactly 0);
  * the gradient AVERAGES over all K matched (key, target) pairs per
    step (diff/inverse.make_train_step_multi) instead of round-robin,
    and the lr follows a cosine decay — the r3 loss oscillated in a
    fixed band for 550 steps at constant lr.

Records loss curve, per-field recovered-vs-true error, and on-chip
seconds/step in INVERSE_r04.json.

Usage: python scripts/inverse_tpu.py [steps] [lr] [n_keys]
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
    from raytracer_tpu.diff import inverse

    params = inverse.apply_domains(params)  # the values that render
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import PRESETS
    from raytracer_tpu.diff import inverse
    from raytracer_tpu.render import render_image
    from raytracer_tpu.scene import builder

    # Physically-attenuated emission + edge-aware visibility: the
    # TRAINING forward (targets use the same forward, so the true
    # parameters stay the exact global optimum; parity rendering keeps
    # the quirk — this is the inverse-problem configuration).
    cfg = PRESETS["inverse_render"].replace(
        reference_emission_quirk=False, edge_aware_lights=True)
    scene = builder.reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    cam = showcase_camera(cfg)

    # Matched (key, target) pairs: exact-truth global optimum under
    # common random numbers; the step AVERAGES gradients over all pairs.
    keys = jax.random.split(jax.random.key(40), n_keys)
    targets = []
    for j in range(n_keys):
        tg = render_image(scene, cam, cfg, keys[j])
        jax.block_until_ready(tg)
        targets.append(tg)
    targets = jnp.stack(targets)
    print(f"targets ready, mean={float(targets.mean()):.4f}", flush=True)

    params = inverse.init_params(scene, fields=FIELDS,
                                 key=jax.random.key(41), noise=0.15)
    err0 = field_errors(scene, params)
    state = inverse.adam_init(params)
    step = inverse.make_train_step_multi(
        scene, cam, cfg, targets, keys, lr=lr,
        lr_fn=inverse.cosine_lr(lr, steps, lr_min_frac=0.05))

    losses = []
    step_times = []
    t_all = time.perf_counter()
    for i in range(steps):
        t0 = time.perf_counter()
        params, state, loss = step(params, state)
        losses.append(float(loss))  # device_get forces execution
        step_times.append(time.perf_counter() - t0)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}: loss={losses[-1]:.6f} "
                  f"({step_times[-1]:.2f} s)", flush=True)
    wall = time.perf_counter() - t_all
    err1 = field_errors(scene, params)

    out = {
        "platform": jax.devices()[0].platform,
        "config": {"width": cfg.width, "height": cfg.height, "spp": cfg.spp,
                   "max_bounces": cfg.max_bounces,
                   "reference_emission_quirk": False,
                   "edge_aware_lights": True},
        "scene": "reference cornell_bunny (mesh materials included)",
        "fields": list(FIELDS),
        "steps": steps,
        "lr": lr,
        "lr_schedule": "cosine to 0.05*lr",
        "n_pairs_averaged": n_keys,
        "seconds_per_step": round(float(np.median(step_times[1:])), 3),
        "first_step_s_with_compile": round(step_times[0], 1),
        "wall_s": round(wall, 1),
        "loss_first": round(losses[0], 6),
        "loss_last": round(losses[-1], 6),
        "param_mean_abs_err_before": {k: round(v, 5) for k, v in err0.items()},
        "param_mean_abs_err_after": {k: round(v, 5) for k, v in err1.items()},
        "loss_curve": [round(x, 6) for x in losses],
        "note": ("Quirk-off training restores throughput-x-emission albedo "
                 "gradients on light-terminated paths; edge_aware_lights "
                 "adds smoothed-boundary visibility gradients (roughness/"
                 "IOR/camera) in control-variate form (forward bit-exact); "
                 "gradients averaged over all matched pairs per step with "
                 "cosine lr decay. Errors are over IDENTIFIABLE entries "
                 "only."),
    }
    print(json.dumps({k: v for k, v in out.items() if k != "loss_curve"},
                     indent=1))
    with open("INVERSE_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
