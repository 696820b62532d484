"""Wavefront path tracer with path regeneration — the performance path.

The reference megakernel gives every pixel-thread the full spp × 20-bounce
loop (CUDAKernels.h:147-166); with Russian roulette most paths die after
~3-5 bounces, so late-bounce lanes idle. The masked megakernel
(models/megakernel.py) inherits that: dead lanes ride along for all
max_bounces iterations.

This integrator instead keeps a fixed-capacity ray QUEUE at full
occupancy (the BASELINE north-star "wavefront formulation"): every
`lax.while_loop` iteration advances each lane one bounce, and lanes whose
path terminated immediately *regenerate* a fresh camera sample claimed
from a global sample counter (prefix-sum rank over idle lanes — the
XLA-native stream compaction, SURVEY.md §2.3 item 9). Terminated paths
scatter-add their radiance into the pixel accumulator. Total iterations
≈ total path segments / queue width, instead of spp × max_bounces.

Material sorting is unnecessary on TPU: all four scatter branches are a
few fused VPU ops computed for every lane and selected by type tag
(ops/materials.py), so there is no divergence penalty to sort away.

Forward-only (while_loop is not reverse-differentiable); gradients use
the megakernel path. Semantics match the reference contract exactly
(RR schedule, unattenuated-emission quirk, 20-bounce black, sky on miss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.camera import Camera, generate_rays
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import intersect as isect
from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops import tonemap
from raytracer_tpu.scene.types import Scene
from raytracer_tpu.utils import rng as rngu


def render_pixels_wavefront(
    scene: Scene,
    cam: Camera,
    px: jnp.ndarray,  # i32[N]
    py: jnp.ndarray,  # i32[N] (0 = bottom row)
    cfg: RenderConfig,
    key: jax.Array,
    spp: int | None = None,
    queue_size: int | None = None,
) -> jnp.ndarray:
    """Mean linear radiance f32[N,3] over spp samples per pixel."""
    spp = cfg.spp if spp is None else spp
    n = px.shape[0]
    total = n * spp
    q = int(min(n, cfg.max_rays_per_pass) if queue_size is None else queue_size)
    pixel_gids = py * cfg.width + px  # global pixel identity for RNG keys

    def cond(state):
        return (state["next_sample"] < total) | jnp.any(state["active"])

    def body(state):
        # --- Regeneration: idle lanes claim the next sample ids. ---
        active = state["active"]
        idle = ~active
        ranks = jnp.cumsum(idle.astype(jnp.int32)) - 1
        sid = state["next_sample"] + ranks
        claim = idle & (sid < total)
        pixel = jnp.where(claim, (sid % n).astype(jnp.int32), state["pixel"])
        sample = jnp.where(claim, (sid // n).astype(jnp.int32), state["sample"])
        bounce = jnp.where(claim, 0, state["bounce"])

        # Per-lane keys: identical derivation to the megakernel path
        # (render.py), so both integrators draw the SAME randoms for a
        # given (pixel, sample, bounce, purpose).
        skeys = rngu.fold(rngu.lane_keys(key, pixel_gids[pixel]), sample)
        kb = rngu.fold(skeys, bounce)

        o_new, d_new = generate_rays(cam, px[pixel], py[pixel], cfg.width, cfg.height, skeys)
        cl3 = claim[:, None]
        origins = jnp.where(cl3, o_new, state["origins"])
        dirs = jnp.where(cl3, d_new, state["dirs"])
        throughput = jnp.where(cl3, 1.0, state["throughput"])
        active = active | claim
        next_sample = state["next_sample"] + jnp.sum(claim)

        # --- Russian roulette (CUDAKernels.h:113-121), per-lane bounce. ---
        do_rr = bounce >= cfg.min_bounces
        survival = jnp.minimum(jnp.max(throughput, axis=-1), cfg.rr_max_prob)
        u_rr = rngu.uniform(kb, rngu.P_RR)
        rr_kill = active & do_rr & (u_rr > survival)
        survived_rr = active & ~rr_kill
        rr_scale = jnp.where(survived_rr & do_rr, 1.0 / jnp.maximum(survival, 1e-12), 1.0)
        throughput = throughput * rr_scale[:, None]

        # --- One bounce for the whole queue. ---
        ids = isect.intersect_scene(scene, origins, dirs, cfg.t_min)
        attrs = isect.shade_hit(scene, origins, dirs, ids)
        sc = mat_ops.scatter(kb, dirs, attrs.normal, attrs.front_face, attrs.mat_id, scene.materials)

        hit = ids.hit & survived_rr
        light_hit = hit & sc.is_light
        miss = survived_rr & ~ids.hit
        cont = hit & sc.scattered & (bounce + 1 < cfg.max_bounces)

        emitted = sc.emission if cfg.reference_emission_quirk else throughput * sc.emission
        contrib = jnp.where(light_hit[:, None], emitted, 0.0)
        contrib = jnp.where(miss[:, None], throughput * tonemap.sky_color(dirs), contrib)
        # Terminations: rr_kill / absorb / max-bounce contribute black.
        terminated = active & ~cont
        acc = state["acc"].at[pixel].add(jnp.where(terminated[:, None], contrib, 0.0))

        throughput = jnp.where(cont[:, None], throughput * sc.attenuation, throughput)
        origins = jnp.where(cont[:, None], attrs.point, origins)
        dirs = jnp.where(cont[:, None], sc.direction, dirs)
        bounce = jnp.where(cont, bounce + 1, bounce)

        return {
            "origins": origins,
            "dirs": dirs,
            "throughput": throughput,
            "pixel": pixel,
            "sample": sample,
            "bounce": bounce,
            "active": cont,
            "acc": acc,
            "next_sample": next_sample,
        }

    state = {
        "origins": jnp.zeros((q, 3), jnp.float32),
        "dirs": jnp.ones((q, 3), jnp.float32),
        "throughput": jnp.ones((q, 3), jnp.float32),
        "pixel": jnp.zeros((q,), jnp.int32),
        "sample": jnp.zeros((q,), jnp.int32),
        "bounce": jnp.zeros((q,), jnp.int32),
        "active": jnp.zeros((q,), bool),
        "acc": jnp.zeros((n, 3), jnp.float32),
        "next_sample": jnp.asarray(0, jnp.int32),
    }
    state = jax.lax.while_loop(cond, body, state)
    return state["acc"] / jnp.float32(spp)


def render_image_wavefront(
    scene: Scene, cam: Camera, cfg: RenderConfig, key: jax.Array, spp: int | None = None
) -> jnp.ndarray:
    from raytracer_tpu.render import _pixel_grid

    px, py = _pixel_grid(cfg)
    rgb = render_pixels_wavefront(scene, cam, px, py, cfg, key, spp=spp)
    return rgb.reshape(cfg.height, cfg.width, 3)
