"""Speed-of-light ledger for the fused megakernel (VERDICT r3 next #1).

Measures, on the real chip, for several (spp, max_bounces) configs of
the 2K showcase frame:
  * wall time of the production kernel,
  * EXACT work counters from the instrumented kernel (profile=True):
    per-packet lockstep traversal iterations and outer path iterations,
then fits  T_frame ≈ a·lockstep_total + b·outer_total + dispatch_floor
and reports:
  * a = cost per lockstep traversal iteration (the kernel's unit cost),
  * b = marginal cost per outer path-loop iteration (RNG, camera regen,
    spheres, materials, scatter — everything but traversal),
  * the op-count floor per traversal iteration (Mosaic scalar ops ~1 ns,
    extracts ~3 ns, row loads ~17 ns — CLAUDE.md calibration), i.e. what
    `a` could be with ALL latency hidden,
  * implied ceilings for this architecture: zero-latency iterations,
    perfect per-call chain balance (max→mean), and both.

Writes KERNEL_STATS_r04.json. Usage: python scripts/sol_ledger.py
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

CONFIGS = [(2, 1), (2, 20), (8, 20)]  # (spp, max_bounces)
DISPATCH_FLOOR_S = 0.025              # per-dispatch floor (kernel_floor_probe)

# Op-count floor per traversal iteration, from the round-2/3 calibration
# (~1 ns/scalar op, ~3 ns/extract, ~17 ns/dynamic row load, vector ops
# ~free at (8,128)): 16 row loads + 8 MT record sweeps (~0.3 us vector
# issue) + 8 slabs + 2 sort-8 networks + ~8×25 scalar push/pop ops.
FLOOR_PER_ITER_US = (16 * 0.017      # dynamic row loads
                     + 0.30          # MT vector issue
                     + 0.15          # slab + sort vector issue
                     + 8 * 25 * 0.001  # scalar phase
                     + 8 * 6 * 0.003)  # task/extract reads
VPU_LANES = 8 * 128
VPU_OPS_PER_CYCLE = 4                # v5e VPU issue width (vector ALUs)
CLOCK_GHZ = 0.94


def main():
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
    from raytracer_tpu.scene.builder import reference_scene

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    key = jax.random.key(0)

    rows = []
    for spp, mb in CONFIGS:
        cfg = RenderConfig(width=2560, height=1440, spp=spp, max_bounces=mb)
        cam = showcase_camera(cfg)
        px, py, _ = _tiled_pixel_grid(cfg)
        g = px.shape[0] // 1024

        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(render_tiles_fused(scene, cam, cfg, key, px, py,
                                     spp=spp).mean())
            ts.append(time.perf_counter() - t0)
        t_prod = min(ts[1:]) if len(ts) > 1 else ts[0]  # drop compile run

        _, cost, aux = render_tiles_fused(scene, cam, cfg, key, px, py,
                                          spp=spp, profile=True)
        a = np.asarray(aux).reshape(g, 8, 128)
        c = np.asarray(cost).reshape(g, 8, 128)
        lock = a[:, 0, 0]
        outer = a[:, 1, 0]
        # Per-row chain totals ≈ row-min of (chain + lane-active) minus
        # nothing — lane-active ≤ outer; use row min as the chain proxy.
        chain_rows = c.min(axis=2)
        row = {
            "spp": spp, "max_bounces": mb,
            "frame_s": round(t_prod, 3),
            "mrays_per_s": round(2560 * 1440 * spp / t_prod / 1e6, 3),
            "lockstep_total": float(lock.sum()),
            "outer_total": float(outer.sum()),
            "mean_lockstep_per_call": round(float(lock.sum() / outer.sum()), 2),
            "mean_chain_per_call_rowmin_proxy": round(
                float(chain_rows.sum() / 8.0 / outer.sum()), 2),
            "packets": int(g),
        }
        rows.append(row)
        print(f"# spp{spp}/mb{mb}: {t_prod:.3f}s lock={lock.sum():.3e} "
              f"outer={outer.sum():.3e} lock/call={row['mean_lockstep_per_call']}"
              f" chain/call~{row['mean_chain_per_call_rowmin_proxy']}",
              flush=True)

    # Fit T = a*lock + b*outer + floor (least squares over configs).
    A = np.array([[r["lockstep_total"], r["outer_total"]] for r in rows])
    y = np.array([r["frame_s"] - DISPATCH_FLOOR_S for r in rows])
    (a_fit, b_fit), res, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ np.array([a_fit, b_fit]) + DISPATCH_FLOOR_S
    print(f"# fit: a={a_fit*1e6:.3f} us/lockstep-iter "
          f"b={b_fit*1e6:.3f} us/outer-iter "
          f"pred={['%.2f' % p for p in pred]}", flush=True)

    hero = rows[-1]
    T = hero["frame_s"]
    trav_s = a_fit * hero["lockstep_total"]
    body_s = b_fit * hero["outer_total"]
    balance = (hero["mean_lockstep_per_call"]
               / max(hero["mean_chain_per_call_rowmin_proxy"], 1e-9))
    ceil_zero_latency = (FLOOR_PER_ITER_US * 1e-6 * hero["lockstep_total"]
                         + body_s + DISPATCH_FLOOR_S)
    ceil_balance = trav_s / balance + body_s + DISPATCH_FLOOR_S
    ceil_both = (FLOOR_PER_ITER_US * 1e-6 * hero["lockstep_total"] / balance
                 + body_s + DISPATCH_FLOOR_S)
    rays = 2560 * 1440 * hero["spp"]

    out = {
        "round": 4,
        "platform": "tpu-v5e-1chip",
        "workload": "2560x1440 showcase interior, fused path-loop megakernel",
        "configs": rows,
        "fit": {
            "us_per_lockstep_iter": round(a_fit * 1e6, 3),
            "us_per_outer_iter": round(b_fit * 1e6, 3),
            "dispatch_floor_s": DISPATCH_FLOOR_S,
            "predicted_s": [round(float(p), 3) for p in pred],
        },
        "decomposition_spp8_mb20": {
            "frame_s": T,
            "traversal_s": round(float(trav_s), 3),
            "path_body_s": round(float(body_s), 3),
            "traversal_frac": round(float(trav_s / T), 3),
        },
        "speed_of_light": {
            "op_floor_us_per_iter": round(FLOOR_PER_ITER_US, 3),
            "latency_overhead_x": round(float(a_fit * 1e6 / FLOOR_PER_ITER_US), 2),
            "per_call_balance_x": round(float(balance), 2),
            "ceiling_mrays_zero_latency": round(rays / ceil_zero_latency / 1e6, 2),
            "ceiling_mrays_perfect_balance": round(rays / ceil_balance / 1e6, 2),
            "ceiling_mrays_both": round(rays / ceil_both / 1e6, 2),
            "note": ("a = fitted cost of one lockstep traversal iteration; "
                     "op_floor = what that iteration costs in pure issue "
                     "slots (CLAUDE.md ~1 ns/scalar-op calibration). The "
                     "gap is the serialized fetch->decide latency chain "
                     "(kernel_interleave_probe: ~15% hideable with 2 "
                     "packets in flight). balance_x is the per-call "
                     "max-over-chains vs mean-over-chains factor — "
                     "unreachable by any static schedule "
                     "(SCHEDULE_STUDY.json) because chains cannot "
                     "exchange work items (each chain's items are its "
                     "own rays' pending nodes)."),
        },
    }
    print(json.dumps(out, indent=1))
    with open("KERNEL_STATS_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
