"""Profile-guided scheduling invariants (raytracer_tpu/schedule.py).

The schedule is a pure permutation of pixels into packets: RNG is
(pixel, sample, bounce)-keyed and each lane computes only its own
pixel's samples, so a scheduled render must be BIT-IDENTICAL per pixel
to the tile-ordered render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu import schedule
from raytracer_tpu.camera import make_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import _tiled_pixel_grid
from raytracer_tpu.ops.bvh import build_lbvh
from raytracer_tpu.ops.bvh4 import build_bvh4
from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
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


def test_profile_cost_output_sane(scene):
    """The instrumented kernel's cost plane: finite, positive where paths
    ran, and the radiance it returns alongside equals the production
    kernel's (the profile carry must not perturb the integrator)."""
    cfg = RenderConfig(width=128, height=16, spp=2, max_bounces=4,
                       rng_impl="ktf")
    key = jax.random.key(3)
    px, py, _ = _tiled_pixel_grid(cfg)
    rgb_p, cost, aux = render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                                          interpret=True, profile=True)
    rgb = render_tiles_fused(scene, _cam(cfg), cfg, key, px, py,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(rgb_p), np.asarray(rgb))
    c = np.asarray(cost)
    assert np.isfinite(c).all()
    assert (c > 0).all()          # every lane traced ≥1 path iteration
    assert c.max() > c.min()      # real variation to schedule on
    # Aux plane: per packet, row 0 = lockstep traversal iters (>= the
    # max per-chain count in that packet), row 1 = outer path iters.
    a = np.asarray(aux).reshape(-1, 8, 128)
    cc = c.reshape(-1, 8, 128)
    lock = a[:, 0, 0]
    outer = a[:, 1, 0]
    assert (lock + 1e-3 >= cc.max(axis=(1, 2)) - outer).all()
    assert (outer >= 1).all() and (outer <= cfg.spp * cfg.max_bounces + 2).all()
    assert (a[:, 2:] == 0).all()


def test_scheduled_render_bit_identical(scene):
    """Cost-bucket + Morton scheduling is a pure pixel permutation: the
    scheduled image equals the tile-ordered image EXACTLY."""
    cfg = RenderConfig(width=128, height=16, spp=2, max_bounces=5,
                       rng_impl="ktf")
    key = jax.random.key(7)
    cam = _cam(cfg)
    px, py, inv = _tiled_pixel_grid(cfg)
    base = np.asarray(render_tiles_fused(scene, cam, cfg, key, px, py,
                                         interpret=True))[np.asarray(inv)]
    px2, py2, inv2 = schedule.build_schedule(scene, cam, cfg, key,
                                             profile_spp=1, n_buckets=4,
                                             interpret=True)
    sched = np.asarray(render_tiles_fused(scene, cam, cfg, key, px2, py2,
                                          interpret=True))[np.asarray(inv2)]
    np.testing.assert_array_equal(base, sched)


def test_row_regroup_is_permutation(scene):
    """order_by_row_cost keeps every 128-lane row intact (content
    unchanged, only packet membership moves)."""
    cfg = RenderConfig(width=128, height=16, spp=1, max_bounces=3,
                       rng_impl="ktf")
    px, py, _ = _tiled_pixel_grid(cfg)
    cost = np.random.default_rng(0).uniform(1, 9, px.shape[0])
    px2, py2, order = schedule.order_by_row_cost(px, py, cost)
    rows = px.shape[0] // 128
    orig = {tuple(np.asarray(px).reshape(rows, 128)[r]) for r in range(rows)}
    new = {tuple(np.asarray(px2).reshape(rows, 128)[r]) for r in range(rows)}
    assert orig == new
    assert sorted(order.tolist()) == list(range(rows))
