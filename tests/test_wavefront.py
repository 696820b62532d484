"""Wavefront (path-regeneration) integrator ≡ megakernel oracle.

Because RNG is keyed by (pixel, sample, bounce, purpose), both
integrators trace the *same* paths; only the fp accumulation order
differs, so allclose holds at tight tolerance (not just statistically).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.camera import make_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.wavefront import render_image_wavefront
from raytracer_tpu.render import render_image
from raytracer_tpu.scene.builder import cornell_spheres_scene


@pytest.fixture(scope="module")
def scene():
    return cornell_spheres_scene()


def _cam(cfg):
    return make_camera(aspect_ratio=cfg.width / cfg.height, fov_degrees=cfg.fov_degrees,
                       aperture=cfg.aperture)


def test_wavefront_matches_megakernel(scene):
    cfg = RenderConfig(width=24, height=24, spp=8, max_bounces=6)
    key = jax.random.key(11)
    a = np.asarray(render_image(scene, _cam(cfg), cfg, key))
    b = np.asarray(render_image_wavefront(scene, _cam(cfg), cfg, key))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)


def test_wavefront_deep_bounces_matches(scene):
    """Regeneration across many samples/bounces must not disturb the
    estimator: high spp + deep bounce cap still equals the megakernel."""
    cfg = RenderConfig(width=12, height=12, spp=16, max_bounces=20)
    key = jax.random.key(3)
    a = np.asarray(render_image(scene, _cam(cfg), cfg, key))
    b = np.asarray(render_image_wavefront(scene, _cam(cfg), cfg, key))
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-4)
