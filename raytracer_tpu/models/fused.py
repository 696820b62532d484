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


# ~2.8 s per dispatch at current 2K throughput; measured overhead vs one
# 8.2 s dispatch is ~1% (chunk probe: None=8.17s, 1200=8.25s, 900=8.41s)
# while keeping every dispatch under the tunnel's ~3 s wedge threshold.
# CALIBRATED AT spp=8: dispatch time scales with packets*spp, so callers
# must scale the packet count inversely with the dispatch spp
# (_chunk_for_spp) — a fixed 1200 at spp=64 would be a ~22 s dispatch,
# far past the wedge threshold (ADVICE r4).
HOST_CHUNK_PACKETS = 1200
_CHUNK_CALIB_SPP = 8          # spp at which HOST_CHUNK_PACKETS was tuned
_CHUNK_MIN_PACKETS = 64       # keep dispatches big enough to amortize the
                              # ~25 ms per-dispatch floor (<3% at 64)


def _chunk_for_spp(spp: int, base: int | None = HOST_CHUNK_PACKETS):
    """Packets per device dispatch for a dispatch tracing `spp` samples
    per lane: holds the packets*spp product at the ~2.8 s calibration
    point so no dispatch trips the tunnel's multi-second wedge."""
    if base is None:
        return None
    return max(_CHUNK_MIN_PACKETS, base * _CHUNK_CALIB_SPP // max(int(spp), 1))


def _fused_pixel_grid(cfg: RenderConfig):
    """Lane layout for the fused kernel: 32x32-pixel packets with
    8(w)x16(h) sub-warp blocks on large frames (+4% over the 1x128
    strip layout — TILE_SHAPE_STUDY.json: compact footprints shrink the
    per-chain union of node visits for bounce rays); the classic 8x128
    screen-tile order on small frames, where 32x32 padding would
    inflate the lane count."""
    if cfg.width % 32 == 0 and cfg.height % 32 == 0:
        from raytracer_tpu.schedule import blocked_pixel_grid

        return blocked_pixel_grid(cfg, 32, 32, 8, 16)
    return _tiled_pixel_grid(cfg)


def fused_available(scene: Scene, cfg: RenderConfig) -> bool:
    px, _, _ = _fused_pixel_grid(cfg)
    return fused_megakernel_available(scene, px.shape[0])


def render_image_fused(
    scene: Scene, cam: Camera, cfg: RenderConfig, key: jax.Array,
    spp: int | None = None, interpret: bool | None = None,
    host_chunk_packets: int | None = HOST_CHUNK_PACKETS,
) -> jnp.ndarray:
    """Full-image render through the fused megakernel → linear f32[H,W,3].
    spp above cfg.spp_per_pass splits into multiple dispatches with
    identical results (sample-offset keying, like the wavefront); big
    frames additionally split into ~2 s device dispatches
    (host_chunk_packets) so no single dispatch can trip the tunnel's
    multi-second wedge (CLAUDE.md)."""
    px, py, inv = _fused_pixel_grid(cfg)
    spp = cfg.spp if spp is None else spp
    step = max(1, min(spp, cfg.spp_per_pass))
    if step >= spp:
        rgb = render_tiles_fused(scene, cam, cfg, key, px, py, spp=spp,
                                 interpret=interpret,
                                 host_chunk_packets=_chunk_for_spp(
                                     spp, host_chunk_packets))
    else:
        acc = None
        done = 0
        while done < spp:
            s = min(step, spp - done)
            part = render_tiles_fused(scene, cam, cfg, key, px, py, spp=s,
                                      sample_offset=done,
                                      interpret=interpret,
                                      host_chunk_packets=_chunk_for_spp(
                                          s, host_chunk_packets)
                                      ) * (s / spp)
            acc = part if acc is None else acc + part
            done += s
        rgb = acc
    return rgb[inv].reshape(cfg.height, cfg.width, 3)
