"""Probe: decompose the PER-PACKET cost of the production kernel.

kernel_stats r2 measures ~320 us/packet for camera packets whose
traversal sim says ~1 lockstep iteration — two orders of magnitude
above the modeled cost (brute pre-pass + root test + 1 iteration).
Something per-packet and iteration-independent dominates. Variants:

  dead        — tlim = -1 everywhere: brute pre-pass runs, root test
                fails, while_loop never executes (the drain-tail shape)
  camera      — top-of-image showcase camera rays (~1 iteration)
  incoherent  — random interior rays (~45 iterations)

each at 64 and 256 packets -> slope = per-packet cost, intercept =
dispatch floor; 'dead' isolates the fixed (pre-loop) cost, camera-dead
the ~1-iteration cost, incoherent-camera the per-iteration cost.
Also: nobrute variants (n_brute_rows=0: the brute rows stay in the
table but are not swept) to price the brute pre-pass.

Usage: python scripts/packet_cost_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.pallas_traverse import (
    BIG, P_LANE, P_SUB, _pack_tables_v6, _traverse_packets)


def main():
    from raytracer_tpu.camera import showcase_camera, generate_rays
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.scene.builder import reference_scene
    from raytracer_tpu.utils import rng as rngu

    scene = reference_scene(assets_dir=os.path.join(
        os.path.dirname(__file__), "..", "assets", "models"), build_bvh=True)
    b4 = scene.bvh4
    node_pack, tri_pack, _, n_brute = _pack_tables_v6(b4, b4.face_mat)
    node_pack, tri_pack = jax.block_until_ready((node_pack, tri_pack))
    stack_cap = b4.stack_depth + 4
    n_children = int(b4.children.shape[1])

    gmax = 256
    n = gmax * 1024
    rng = np.random.default_rng(0)
    o_inc = rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc = (dd / np.linalg.norm(dd, axis=1, keepdims=True)).astype(np.float32)

    cfg = RenderConfig(width=2560, height=1440, spp=2, max_bounces=20)
    cam = showcase_camera(cfg)
    px, py, _ = _tiled_pixel_grid(cfg)
    keys = rngu.lane_keys(jax.random.key(0), py[:n] * cfg.width + px[:n])
    o_cam, d_cam = generate_rays(cam, px[:n], py[:n], cfg.width, cfg.height, keys)
    o_cam = np.asarray(o_cam)
    d_cam = np.asarray(d_cam)

    def pack(o, d, g):
        o_pk = jnp.asarray(o[:g * 1024]).reshape(g, 1024, 3).transpose(
            0, 2, 1).reshape(g, 3, P_SUB, P_LANE)
        d_pk = jnp.asarray(d[:g * 1024]).reshape(g, 1024, 3).transpose(
            0, 2, 1).reshape(g, 3, P_SUB, P_LANE)
        return jax.block_until_ready((o_pk, d_pk))

    rows = []
    for name, o, d, tval in (("dead", o_cam, d_cam, -1.0),
                             ("camera", o_cam, d_cam, float(BIG)),
                             ("incoher", o_inc, d_inc, float(BIG))):
        for nb in (n_brute, 0):
            times = {}
            for g in (64, 256):
                o_pk, d_pk = pack(o, d, g)
                tlim = jnp.full((g, P_SUB, P_LANE), tval, jnp.float32)
                r = _traverse_packets(node_pack, tri_pack, o_pk, d_pk, tlim,
                                      stack_cap=stack_cap, n_brute_rows=nb,
                                      n_children=n_children)
                float(np.asarray(r[0])[0, 0, 0])
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    r = _traverse_packets(node_pack, tri_pack, o_pk, d_pk,
                                          tlim, stack_cap=stack_cap,
                                          n_brute_rows=nb,
                                          n_children=n_children)
                    float(np.asarray(r[0])[0, 0, 0])
                    best = min(best, time.perf_counter() - t0)
                times[g] = best
            slope = (times[256] - times[64]) / (256 - 64) * 1e6
            icept = times[64] - slope * 64 * 1e-6
            tag = "brute" if nb else "nobrute"
            print(f"{name:8s} {tag:8s}: 64pk {times[64]*1e3:7.2f} ms  "
                  f"256pk {times[256]*1e3:7.2f} ms  -> {slope:7.2f} us/packet "
                  f"(+{icept*1e3:6.1f} ms floor)", flush=True)
            rows.append((name, tag, slope, icept))

    # Real-frame cross-check in the SAME process: 2K spp2/mb1 should be
    # ~2 camera sweeps + 2 XLA iterations (~0.1-0.15 s by the probes) —
    # kernel_stats measured 1.03 s. Whichever number reproduces here
    # localizes the discrepancy (process state vs code path).
    from raytracer_tpu.models.wavefront import render_image_wavefront

    c1 = RenderConfig(width=2560, height=1440, spp=2, max_bounces=1,
                      spp_per_pass=2)
    img = render_image_wavefront(scene, cam, c1, jax.random.key(0))
    jax.block_until_ready(img)
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        img = render_image_wavefront(scene, cam, c1, jax.random.key(1 + i))
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)
    print(f"real 2K spp2/mb1: {best:.3f} s", flush=True)


if __name__ == "__main__":
    main()
