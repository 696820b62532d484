"""Fused path-loop megakernel ≡ XLA integrators under rng_impl="ktf".

Both draw from the SAME (pixel, sample, bounce, purpose) Threefry
counters (utils/ktf.py), so they trace the same paths; only fp
fusion/summation order differs. Runs the kernel in interpret mode on
the CPU mesh (same discipline as tests/test_pallas_traverse.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.camera import make_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.fused import fused_available, render_image_fused
from raytracer_tpu.models.wavefront import render_image_wavefront
from raytracer_tpu.ops.bvh import build_lbvh
from raytracer_tpu.ops.bvh4 import build_bvh4
from raytracer_tpu.scene.builder import cornell_materials_scene


@pytest.fixture(scope="module")
def scene():
    sc = cornell_materials_scene(assets_dir="assets/models")
    bvh = build_lbvh(sc.mesh)
    return sc.replace(bvh=bvh, bvh4=build_bvh4(sc.mesh, bvh))


def _cam(cfg):
    return make_camera(aspect_ratio=cfg.width / cfg.height,
                       fov_degrees=cfg.fov_degrees, aperture=cfg.aperture,
                       position=(0.0, 0.05, 0.29), pitch=-5.0)


def test_fused_available(scene):
    cfg = RenderConfig(width=128, height=8, spp=2, max_bounces=3)
    assert fused_available(scene, cfg)


def test_fused_matches_ktf_wavefront_one_packet(scene):
    cfg = RenderConfig(width=128, height=8, spp=2, max_bounces=4,
                       rng_impl="ktf")
    key = jax.random.key(21)
    fused = np.asarray(render_image_fused(scene, _cam(cfg), cfg, key,
                                          interpret=True))
    wave = np.asarray(render_image_wavefront(scene, _cam(cfg), cfg, key))
    assert np.isfinite(fused).all()
    np.testing.assert_allclose(fused, wave, atol=2e-4, rtol=1e-4)


def test_fused_matches_ktf_wavefront_multi_packet_deep(scene):
    """Multiple packets + RR active (max_bounces past min_bounces) +
    spp regeneration: the whole integrator contract.

    Tolerance note: the kernel and XLA compile the same formulas with
    different fma/reciprocal contraction, so a handful of paths flip a
    discrete decision at an ulp boundary (e.g. a bounce direction lands
    on the other side of a silhouette edge) — measured 3 of 4096 pixels
    on this config, IDENTICAL at max_bounces 3 and 8 (so not RR), with
    image means equal to 1e-5. Both sides are unbiased estimators; the
    assertion is: almost-all elements tight + means tight."""
    cfg = RenderConfig(width=256, height=16, spp=4, max_bounces=8,
                       rng_impl="ktf")
    key = jax.random.key(5)
    fused = np.asarray(render_image_fused(scene, _cam(cfg), cfg, key,
                                          interpret=True))
    wave = np.asarray(render_image_wavefront(scene, _cam(cfg), cfg, key))
    assert np.isfinite(fused).all()
    bad = np.abs(fused - wave) > (5e-4 + 2e-4 * np.abs(wave))
    assert bad.mean() < 0.005, f"{bad.sum()}/{bad.size} elements diverge"
    np.testing.assert_allclose(fused.mean(axis=(0, 1)), wave.mean(axis=(0, 1)),
                               atol=1e-3, rtol=1e-3)


def test_fused_sharded_matches_single_device(scene):
    """The fused megakernel under shard_map (the production multi-chip
    path, VERDICT r3 next #3): sharded-fused must equal single-device
    fused. 128x64 → 8 packets on the 8-device mesh, so g % n_shards == 0
    and the round-robin interleave permutation is ACTIVE (ADVICE r3:
    previously every test fell back to contiguous assignment);
    interleaved, contiguous, and single-device must all agree."""
    from raytracer_tpu.parallel.sharding import (make_mesh,
                                                 render_image_fused_sharded)

    cfg = RenderConfig(width=128, height=64, spp=1, max_bounces=3,
                       rng_impl="ktf")
    key = jax.random.key(13)
    single = np.asarray(render_image_fused(scene, _cam(cfg), cfg, key,
                                           interpret=True))
    mesh = make_mesh()
    inter = np.asarray(render_image_fused_sharded(
        scene, _cam(cfg), cfg, key, mesh=mesh, interleave=True))
    contig = np.asarray(render_image_fused_sharded(
        scene, _cam(cfg), cfg, key, mesh=mesh, interleave=False))
    np.testing.assert_allclose(single, inter, atol=5e-7, rtol=0)
    np.testing.assert_allclose(single, contig, atol=5e-7, rtol=0)


def test_fused_host_chunked_matches_single_dispatch(scene):
    """Splitting a frame into separate per-chunk device dispatches
    (host_chunk_packets — the anti-wedge ≤2-3 s dispatch rule) is
    invisible: per-lane results are computed independently, so the
    chunked render equals the one-dispatch render EXACTLY, including a
    non-divisible tail chunk (8 packets in chunks of 3 → 3+3+2)."""
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    cfg = RenderConfig(width=128, height=64, spp=1, max_bounces=3,
                       rng_impl="ktf")
    key = jax.random.key(4)
    px, py, _ = _tiled_pixel_grid(cfg)
    whole = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                          interpret=True))
    chunked = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                            interpret=True,
                                            host_chunk_packets=3))
    np.testing.assert_array_equal(whole, chunked)


def test_fused_blocked_grid_matches_strip_grid(scene):
    """The 32x32-block lane layout (models/fused._fused_pixel_grid) is a
    pure relabeling: the assembled image equals the strip-layout image
    EXACTLY (pixel-keyed RNG)."""
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
    from raytracer_tpu.schedule import blocked_pixel_grid

    cfg = RenderConfig(width=128, height=32, spp=1, max_bounces=3,
                       rng_impl="ktf")
    key = jax.random.key(6)
    px, py, inv = _tiled_pixel_grid(cfg)
    strip = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                          interpret=True))[np.asarray(inv)]
    px2, py2, inv2 = blocked_pixel_grid(cfg, 32, 32, 8, 16)
    blk = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px2, py2,
                                        interpret=True))[np.asarray(inv2)]
    np.testing.assert_array_equal(strip, blk)


def test_fused_interleave2_matches_single(scene):
    """G=2 merged path loops (pallas_interleave.traverse_tiles): two
    packets share one while loop with cond-gated per-tile steps. Chain
    decisions depend only on chain state, so per-packet results must
    equal the G=1 kernel EXACTLY — including an odd trailing packet
    count (which falls back to G=1)."""
    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    cfg = RenderConfig(width=128, height=64, spp=2, max_bounces=6,
                       rng_impl="ktf")
    key = jax.random.key(15)
    px, py, _ = _tiled_pixel_grid(cfg)
    g1 = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                       interpret=True, interleave=1))
    g2 = np.asarray(render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                       interpret=True, interleave=2))
    np.testing.assert_array_equal(g1, g2)

    cfg3 = RenderConfig(width=128, height=24, spp=1, max_bounces=3,
                        rng_impl="ktf")  # 3 packets → odd fallback
    px3, py3, _ = _tiled_pixel_grid(cfg3)
    a = np.asarray(render_tiles_fused(scene, _cam(cfg3), cfg3, key, px3, py3,
                                      interpret=True, interleave=1))
    b = np.asarray(render_tiles_fused(scene, _cam(cfg3), cfg3, key, px3, py3,
                                      interpret=True, interleave=2))
    np.testing.assert_array_equal(a, b)


def test_fused_spp_batched_matches_single_pass(scene):
    """sample_offset keying: spp split across dispatches is invariant."""
    cfg1 = RenderConfig(width=128, height=8, spp=4, max_bounces=4,
                        rng_impl="ktf", spp_per_pass=4)
    cfg2 = cfg1.replace(spp_per_pass=2)
    key = jax.random.key(9)
    a = np.asarray(render_image_fused(scene, _cam(cfg1), cfg1, key,
                                      interpret=True))
    b = np.asarray(render_image_fused(scene, _cam(cfg2), cfg2, key,
                                      interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
