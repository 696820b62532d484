"""Probe: what makes a wavefront while_loop ITERATION cost ~0.18 s of
XLA work at 2K (3.7M lanes), independent of the traversal kernel?
(frame_breakdown.py: spp2/mb1 = 0.611 s with a ~1-iteration kernel.)

Variants time render_pixels_wavefront-shaped loops with the trace step
replaced/bisected (all at 2560x1440 lanes, fixed 4 iterations via a
fori_loop so every variant runs identical counts):

  full      — the real body (fused Pallas trace)
  notrace   — trace replaced by constant hit data (pure XLA machinery:
              regen + RNG folds + RR + scatter_params + wheres)
  notrace_norng  — notrace with RNG uniforms replaced by constants
              (isolates threefry fold/uniform cost)
  notrace_noregen — notrace with generate_rays hoisted out of the loop
              (isolates per-iteration raygen cost)
  trace_only— just the fused trace per iteration on fixed rays
              (kernel + packing/unpacking reshapes, no XLA shading)

Usage: python scripts/xla_iter_probe.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from raytracer_tpu.camera import showcase_camera, generate_rays
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import _tiled_pixel_grid
from raytracer_tpu.ops import intersect as isect
from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops import tonemap
from raytracer_tpu.scene.builder import reference_scene
from raytracer_tpu.utils import rng as rngu

W = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1440
N_ITERS = 4


def main():
    cfg = RenderConfig(width=W, height=H, spp=2, max_bounces=20)
    cam = showcase_camera(cfg)
    scene = reference_scene(assets_dir=os.path.join(
        os.path.dirname(__file__), "..", "assets", "models"), build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    px, py, _ = _tiled_pixel_grid(cfg)
    n = px.shape[0]

    def make_loop(variant):
        def run(scene, cam, px, py, key):
            pkeys = rngu.lane_keys(key, py * cfg.width + px)
            o0, d0 = generate_rays(cam, px, py, cfg.width, cfg.height, pkeys)

            def body(it, state):
                origins, dirs, throughput, acc, sample, bounce = state
                active = sample < jnp.int32(999)
                claim = ~active
                skeys = rngu.fold(pkeys, sample)
                kb = rngu.fold(skeys, bounce)
                if variant == "notrace_noregen":
                    o_new, d_new = o0, d0
                else:
                    o_new, d_new = generate_rays(cam, px, py, cfg.width,
                                                 cfg.height, skeys)
                origins = jnp.where(claim[:, None], o_new, origins)
                dirs = jnp.where(claim[:, None], d_new, dirs)

                do_rr = bounce >= cfg.min_bounces
                survival = jnp.minimum(jnp.max(throughput, axis=-1),
                                       cfg.rr_max_prob)
                if variant == "notrace_norng":
                    u_rr = survival * 0.5
                else:
                    u_rr = rngu.uniform(kb, rngu.P_RR)
                rr_kill = active & do_rr & (u_rr > survival)
                survived = active & ~rr_kill
                scale = jnp.where(survived & do_rr,
                                  1.0 / jnp.maximum(survival, 1e-12), 1.0)
                throughput = throughput * scale[:, None]

                if variant.startswith("notrace"):
                    ray_hit = (px & 1) == 0
                    point = origins + 0.1 * dirs
                    normal = jnp.concatenate(
                        [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=1)
                    front = ray_hit
                    params = mat_ops.MatParams(
                        mtype=jnp.zeros((n,), jnp.int32),
                        albedo=jnp.full((n, 3), 0.5),
                        emission=jnp.zeros((n, 3)),
                        roughness=jnp.zeros((n,)),
                        ior=jnp.full((n,), 1.5))
                    if variant == "notrace_norng":
                        sc = mat_ops.ScatterResult(
                            direction=normal, attenuation=params.albedo,
                            emission=params.emission,
                            scattered=ray_hit, is_light=~ray_hit)
                    else:
                        sc = mat_ops.scatter_params(kb, dirs, normal, front,
                                                    params)
                else:
                    fh = isect.trace_frame_fused(scene, origins, dirs,
                                                 cfg.t_min, sort=False,
                                                 active=survived)
                    ray_hit, point = fh.hit, fh.point
                    if variant == "trace_only":
                        acc = acc + jnp.where(ray_hit[:, None],
                                              fh.normal * 1e-6, 0.0)
                        dirs = jnp.where((it % 2 == 0)[..., None] if False
                                         else ray_hit[:, None],
                                         dirs, -dirs)
                        return (origins, dirs, throughput, acc, sample,
                                bounce)
                    sc = mat_ops.scatter_params(kb, dirs, fh.normal,
                                                fh.front_face, fh.params)
                    point = fh.point

                if not variant.startswith("notrace"):
                    point_ = point
                else:
                    point_ = point
                hit = ray_hit & survived
                miss = survived & ~ray_hit
                cont = hit & sc.scattered & (bounce + 1 < cfg.max_bounces)
                emitted = sc.emission
                contrib = jnp.where((hit & sc.is_light)[:, None], emitted, 0.0)
                contrib = jnp.where(miss[:, None],
                                    throughput * tonemap.sky_color(dirs),
                                    contrib)
                terminated = active & ~cont
                acc = acc + jnp.where(terminated[:, None], contrib, 0.0)
                sample = jnp.where(terminated, sample + 1, sample)
                throughput = jnp.where(cont[:, None],
                                       throughput * sc.attenuation, throughput)
                origins = jnp.where(cont[:, None], point_, origins)
                dirs = jnp.where(cont[:, None], sc.direction, dirs)
                bounce = jnp.where(cont, bounce + 1, bounce)
                return origins, dirs, throughput, acc, sample, bounce

            state = (o0, d0, jnp.ones((n, 3)), jnp.zeros((n, 3)),
                     jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
            state = jax.lax.fori_loop(0, N_ITERS, body, state)
            return state[3].sum()

        return jax.jit(run)

    for variant in ("notrace_norng", "notrace_noregen", "notrace",
                    "trace_only", "full"):
        fn = make_loop(variant)
        r = fn(scene, cam, px, py, jax.random.key(0))
        r.block_until_ready()
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            fn(scene, cam, px, py, jax.random.key(1 + i)).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{variant:16s}: {best:7.3f} s total -> {best/N_ITERS*1e3:8.1f} "
              f"ms/iter", flush=True)


if __name__ == "__main__":
    main()
