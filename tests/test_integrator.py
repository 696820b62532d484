"""Golden/characterization tests: JAX integrator vs the independent
NumPy oracle (reference semantics), statistical tolerance ∝ 1/√samples
(SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import render_image, render_image_chunked
from raytracer_tpu.scene.builder import cornell_spheres_scene

from oracle import OracleScene, render as oracle_render


@pytest.fixture(scope="module")
def scene():
    return cornell_spheres_scene()


def _downsample(img, f):
    h, w, _ = img.shape
    return np.asarray(img).reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))


def test_render_smoke_finite_nonnegative(scene):
    cfg = RenderConfig(width=32, height=32, spp=4, max_bounces=4)
    img = render_image(scene, _cam(cfg), cfg, jax.random.key(0))
    a = np.asarray(img)
    assert a.shape == (32, 32, 3)
    assert np.isfinite(a).all()
    assert (a >= 0).all()
    assert a.mean() > 0.01  # scene is lit


def _cam(cfg):
    from raytracer_tpu.camera import make_camera

    return make_camera(aspect_ratio=cfg.width / cfg.height, fov_degrees=cfg.fov_degrees,
                       aperture=cfg.aperture)


def test_matches_numpy_oracle(scene):
    cfg = RenderConfig(width=32, height=32, spp=96, max_bounces=4)
    img = np.asarray(render_image(scene, _cam(cfg), cfg, jax.random.key(7)))

    osc = OracleScene.from_scene(scene)
    ref = oracle_render(osc, cfg.width, cfg.height, spp=96, max_bounces=4, seed=3)

    # 4×4-pixel tile means: 16 px × 96 spp = 1536 samples per tile.
    a = _downsample(img, 4)
    b = _downsample(ref, 4)
    diff = np.abs(a - b)
    assert diff.mean() < 0.02, f"mean tile diff {diff.mean():.4f}"
    assert diff.max() < 0.25, f"max tile diff {diff.max():.4f}"
    # Global mean brightness agreement.
    np.testing.assert_allclose(img.mean(axis=(0, 1)), ref.mean(axis=(0, 1)), atol=0.01)


def test_emission_quirk_flag_changes_light_pixels(scene):
    cfg = RenderConfig(width=24, height=24, spp=32, max_bounces=4)
    img_quirk = np.asarray(render_image(scene, _cam(cfg), cfg, jax.random.key(0)))
    cfg2 = cfg.replace(reference_emission_quirk=False)
    img_phys = np.asarray(render_image(scene, _cam(cfg2), cfg2, jax.random.key(0)))
    # Physically-attenuated emission must dim indirect light overall.
    assert img_phys.mean() <= img_quirk.mean() + 1e-6
    assert not np.allclose(img_quirk, img_phys)


def test_chunked_matches_unchunked(scene):
    cfg = RenderConfig(width=16, height=16, spp=8, max_bounces=3,
                       max_rays_per_pass=16 * 4, spp_per_pass=8)
    a = np.asarray(render_image_chunked(scene, _cam(cfg), cfg, jax.random.key(5)))
    assert a.shape == (16, 16, 3)
    assert np.isfinite(a).all()
    # Chunked rendering is an unbiased estimator of the same image —
    # same statistics, different keys. Compare against a direct render.
    cfg_big = cfg.replace(spp=64)
    b = np.asarray(render_image(scene, _cam(cfg_big), cfg_big, jax.random.key(9)))
    assert abs(a.mean() - b.mean()) < 0.05


def test_max_bounces_exhaustion_returns_black():
    """A mirror box: rays bounce forever; reference returns black
    (CUDAKernels.h:105). With max_bounces small and no RR the image must
    be black."""
    from raytracer_tpu.scene.types import Materials, Scene, Spheres, TriMesh, METAL

    mats = Materials.from_lists(types=[METAL], albedos=[(1.0, 1.0, 1.0)])
    # A huge mirror sphere enclosing the camera: every path bounces inside.
    spheres = Spheres.from_lists(centers=[(0.0, 0.0, 0.0)], radii=[100.0], mat_ids=[0])
    scene = Scene(materials=mats, spheres=spheres, mesh=TriMesh.empty())
    cfg = RenderConfig(width=8, height=8, spp=4, max_bounces=3, min_bounces=99)
    img = np.asarray(render_image(scene, _cam(cfg), cfg, jax.random.key(0)))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)


def test_triangle_scene_matches_oracle():
    """Golden test for the triangle path: Cornell OBJ box (+ extras)
    rendered by the JAX integrator vs the independent NumPy oracle."""
    from raytracer_tpu.scene import builder

    scene = builder.cornell_materials_scene(assets_dir="assets/models")
    scene = scene.replace(bvh4=builder.build_scene_bvh4(scene.mesh))
    cfg = RenderConfig(width=24, height=24, spp=48, max_bounces=4)
    from raytracer_tpu.camera import make_camera

    cam = make_camera(aspect_ratio=1.0, fov_degrees=cfg.fov_degrees,
                      aperture=cfg.aperture, position=(0.0, 0.35, 1.3), pitch=-12.0)
    img = np.asarray(render_image(scene, cam, cfg, jax.random.key(3)))

    osc = OracleScene.from_scene(scene)
    ref = oracle_render(osc, 24, 24, spp=48, max_bounces=4, seed=11,
                        position=(0.0, 0.35, 1.3), pitch=-12.0,
                        focus_dist=float(np.linalg.norm([0.0, 0.35, 1.3])))
    a = _downsample(img, 4)
    b = _downsample(ref, 4)
    diff = np.abs(a - b)
    assert diff.mean() < 0.05, f"mean tile diff {diff.mean():.4f}"
    np.testing.assert_allclose(img.mean(axis=(0, 1)), ref.mean(axis=(0, 1)), atol=0.04)
