"""End-to-end pipeline tests over triangle scenes (loader → BVH4 →
packet traversal → integrators), wide enough to exercise the packet
traversal dispatch (≥4096 rays)."""

import jax
import numpy as np
import pytest

from raytracer_tpu.camera import make_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import render_image_wavefront
from raytracer_tpu.render import render_image
from raytracer_tpu.scene import builder


@pytest.fixture(scope="module")
def scene():
    s = builder.cornell_materials_scene(assets_dir="assets/models")
    return s.replace(bvh4=builder.build_scene_bvh4(s.mesh))


def _cam(cfg):
    return make_camera(aspect_ratio=cfg.width / cfg.height, fov_degrees=cfg.fov_degrees,
                       aperture=cfg.aperture, position=(0.0, 0.35, 1.3), pitch=-12.0)


def test_cornell_render_wide_batch(scene):
    """80x80 = 6400 rays → the packet-traversal dispatch path."""
    cfg = RenderConfig(width=80, height=80, spp=2, max_bounces=4)
    img = np.asarray(render_image(scene, _cam(cfg), cfg, jax.random.key(0)))
    assert np.isfinite(img).all() and (img >= 0).all()
    # The box interior occupies the central ~40% of the frame at this
    # camera; wall-color bleed must tint the interior sides: one side
    # red-dominant, the other green-dominant (mirrored-u reference
    # convention decides which is which).
    cl = img[30:55, 24:32].mean(axis=(0, 1))
    cr = img[30:55, 48:56].mean(axis=(0, 1))
    ratios = (cl[0] / cl[1], cr[0] / cr[1])  # R/G per side
    assert max(ratios) > 1.1 and min(ratios) < 0.95, (cl, cr)
    # The area light must push some pixels above 1 (pre-tonemap linear).
    assert img.max() > 1.0


def test_wavefront_equals_megakernel_on_triangle_scene(scene):
    cfg = RenderConfig(width=80, height=80, spp=2, max_bounces=5)
    key = jax.random.key(4)
    a = np.asarray(render_image(scene, _cam(cfg), cfg, key))
    b = np.asarray(render_image_wavefront(scene, _cam(cfg), cfg, key))
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-4)


def test_native_and_python_builders_agree(scene):
    """Native SAH BVH4 and Python LBVH-collapse BVH4 produce identical
    images (acceleration structure is output-invariant)."""
    from raytracer_tpu.ops.bvh import build_lbvh
    from raytracer_tpu.ops.bvh4 import build_bvh4

    cfg = RenderConfig(width=48, height=48, spp=2, max_bounces=4)
    key = jax.random.key(9)
    img_native = np.asarray(render_image(scene, _cam(cfg), cfg, key))
    scene_py = scene.replace(bvh4=build_bvh4(scene.mesh, build_lbvh(scene.mesh)))
    img_py = np.asarray(render_image(scene_py, _cam(cfg), cfg, key))
    np.testing.assert_allclose(img_native, img_py, atol=1e-5, rtol=1e-5)


def test_fused_trace_matches_generic(scene):
    """The zero-gather Pallas trace+shade path (interpret mode on CPU)
    agrees with intersect_scene + shade_hit + material lookup."""
    from raytracer_tpu.camera import generate_rays
    from raytracer_tpu.ops import intersect as isect
    from raytracer_tpu.ops import materials as mat_ops
    from raytracer_tpu.utils import rng as rngu

    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=2)
    cam = _cam(cfg)
    import jax.numpy as jnp

    px = jnp.tile(jnp.arange(64, dtype=jnp.int32), 64)
    py = jnp.repeat(jnp.arange(64, dtype=jnp.int32), 64)
    keys = rngu.lane_keys(jax.random.key(0), py * 64 + px)
    o, d = generate_rays(cam, px, py, 64, 64, keys)

    fh = isect.trace_frame_fused(scene, o, d, 1e-3, interpret=True)
    ids = isect.intersect_scene(scene, o, d, 1e-3)
    attrs = isect.shade_hit(scene, o, d, ids)
    params = mat_ops.lookup_params(scene.materials, attrs.mat_id)

    np.testing.assert_array_equal(np.asarray(fh.hit), np.asarray(ids.hit))
    hit = np.asarray(ids.hit)
    np.testing.assert_allclose(np.asarray(fh.point)[hit], np.asarray(attrs.point)[hit],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fh.normal)[hit], np.asarray(attrs.normal)[hit],
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fh.front_face)[hit],
                                  np.asarray(attrs.front_face)[hit])
    np.testing.assert_array_equal(np.asarray(fh.params.mtype)[hit],
                                  np.asarray(params.mtype)[hit])
    np.testing.assert_allclose(np.asarray(fh.params.albedo)[hit],
                               np.asarray(params.albedo)[hit], atol=1e-6)

    # Active-mask: live lanes get identical results; masked lanes are
    # dead weight whose traversal is skipped (t_lim = -1).
    act = (px % 3 != 0)
    fh_m = isect.trace_frame_fused(scene, o, d, 1e-3, interpret=True, active=act)
    live = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(fh_m.hit)[live], np.asarray(fh.hit)[live])
    np.testing.assert_allclose(np.asarray(fh_m.point)[live & hit],
                               np.asarray(fh.point)[live & hit], atol=1e-6)
