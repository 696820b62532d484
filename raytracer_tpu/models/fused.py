"""Image driver for the fused path-loop megakernel.

One (or few, spp-batched) device dispatches per frame: the integrator
runs entirely inside ops/pallas_megakernel.py. RNG is the ktf counter
family, so results match the XLA integrators under cfg.rng_impl="ktf"
to fp-summation tolerance (tests/test_fused_megakernel.py) — the fused
analog of the wavefront ≡ megakernel invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.camera import Camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import _tiled_pixel_grid
from raytracer_tpu.ops.pallas_megakernel import (fused_megakernel_available,
                                                render_tiles_fused)
from raytracer_tpu.scene.types import Scene


def fused_available(scene: Scene, cfg: RenderConfig) -> bool:
    px, _, _ = _tiled_pixel_grid(cfg)
    return fused_megakernel_available(scene, px.shape[0])


def render_image_fused(
    scene: Scene, cam: Camera, cfg: RenderConfig, key: jax.Array,
    spp: int | None = None, interpret: bool | None = None,
) -> jnp.ndarray:
    """Full-image render through the fused megakernel → linear f32[H,W,3].
    spp above cfg.spp_per_pass splits into multiple dispatches with
    identical results (sample-offset keying, like the wavefront)."""
    px, py, inv = _tiled_pixel_grid(cfg)
    spp = cfg.spp if spp is None else spp
    step = max(1, min(spp, cfg.spp_per_pass))
    if step >= spp:
        rgb = render_tiles_fused(scene, cam, cfg, key, px, py, spp=spp,
                                 interpret=interpret)
    else:
        acc = None
        done = 0
        while done < spp:
            s = min(step, spp - done)
            part = render_tiles_fused(scene, cam, cfg, key, px, py, spp=s,
                                      sample_offset=done,
                                      interpret=interpret) * (s / spp)
            acc = part if acc is None else acc + part
            done += s
        rgb = acc
    return rgb[inv].reshape(cfg.height, cfg.width, 3)
