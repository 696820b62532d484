"""Gradient checks: VJP vs finite differences (SURVEY.md §4 item 3,
BASELINE "pixel-grad allclose pass").

The integrator's discrete decisions (hit selection, dielectric branch)
are detached, so gradients are exact for the *fixed-path* estimator:
finite differences with the SAME rng key agree with autodiff as long as
the perturbation doesn't flip a discrete decision — we use small eps and
loose rtol to stay in that regime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.camera import make_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import render_image
from raytracer_tpu.scene.builder import cornell_spheres_scene
from raytracer_tpu.scene.types import Materials


@pytest.fixture(scope="module")
def scene():
    return cornell_spheres_scene()


def _cam(cfg):
    return make_camera(aspect_ratio=cfg.width / cfg.height, fov_degrees=cfg.fov_degrees,
                       aperture=cfg.aperture)


def _loss_fn(scene, cfg, key):
    cam = _cam(cfg)

    def loss(albedo, emission, roughness):
        mats = Materials(
            type=scene.materials.type,
            albedo=albedo,
            emission=emission,
            roughness=roughness,
            ior=scene.materials.ior,
        )
        s = scene.replace(materials=mats)
        img = render_image(s, cam, cfg, key)
        return jnp.mean(img)

    return loss


def test_material_grads_match_finite_difference(scene):
    cfg = RenderConfig(width=12, height=12, spp=4, max_bounces=3)
    key = jax.random.key(17)
    loss = _loss_fn(scene, cfg, key)
    m = scene.materials
    args = (m.albedo, m.emission, m.roughness)

    grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)

    # Finite-difference spot checks on the most influential entries.
    checks = [
        (0, (0, 0)),  # ground albedo R
        (0, (2, 1)),  # red diffuse G
        (1, (5, 0)),  # light emission R
    ]
    for argi, idx in checks:
        eps = 1e-3
        g_ad = float(grads[argi][idx])
        perturbed = list(args)
        perturbed[argi] = args[argi].at[idx].add(eps)
        lp = float(loss(*perturbed))
        perturbed[argi] = args[argi].at[idx].add(-eps)
        lm = float(loss(*perturbed))
        g_fd = (lp - lm) / (2 * eps)
        assert np.isclose(g_ad, g_fd, rtol=0.08, atol=1e-5), (argi, idx, g_ad, g_fd)


def test_emission_gradient_is_positive_toward_brightness(scene):
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=3)
    loss = _loss_fn(scene, cfg, jax.random.key(3))
    m = scene.materials
    g_em = jax.grad(loss, argnums=1)(m.albedo, m.emission, m.roughness)
    # Brightening the light brightens the image.
    assert float(g_em[5].sum()) > 0.0


def test_camera_gradients_flow(scene):
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=3)
    key = jax.random.key(5)

    def loss(fov, position):
        cam = make_camera(
            aspect_ratio=1.0, fov_degrees=fov, aperture=cfg.aperture, position=position
        )
        return jnp.mean(render_image(scene, cam, cfg, key))

    g_fov, g_pos = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(80.0), jnp.asarray([0.0, 4.0, 4.0])
    )
    assert np.isfinite(float(g_fov))
    assert np.isfinite(np.asarray(g_pos)).all()
    assert (np.abs(np.asarray(g_pos)) > 0).any()


def test_inverse_rendering_recovers_albedo(scene):
    """BASELINE config[4] in miniature: perturb a diffuse albedo, optimize
    against the clean render, and verify the parameter moves back toward
    the truth (not merely that loss decreases)."""
    from raytracer_tpu.diff import inverse

    cfg = RenderConfig(width=32, height=16, spp=4, max_bounces=3)
    # Camera that actually frames the spheres (the reference default pose
    # looks over the scene; see PARITY.md item 7).
    cam = make_camera(aspect_ratio=2.0, fov_degrees=cfg.fov_degrees,
                      aperture=cfg.aperture, position=(0.0, 0.5, 1.6), pitch=-14.0)
    target = render_image(scene, cam, cfg, jax.random.key(77))

    true_albedo = np.asarray(scene.materials.albedo)
    params = {"albedo": scene.materials.albedo.at[2].set(
        jnp.asarray([0.2, 0.6, 0.6]))}  # red diffuse sphere → wrong color
    err0 = float(jnp.abs(params["albedo"][2] - true_albedo[2]).sum())

    state = inverse.adam_init(params)
    step = inverse.make_train_step(scene, cam, cfg, target, lr=0.08)
    # Fixed-noise matching: optimizing with the SAME rng key as the
    # target makes the true parameters an exact optimum (loss → 0),
    # standard practice for low-spp inverse rendering.
    for i in range(25):
        params, state, loss = step(params, state, jax.random.key(77))
    # Compare in EFFECTIVE parameter space: the renderer clips albedo to
    # [0,1] (diff/inverse._apply_params), so raw params may overshoot.
    eff = jnp.clip(params["albedo"][2], 0.0, 1.0)
    err1 = float(jnp.abs(eff - true_albedo[2]).sum())
    assert err1 < err0 * 0.45, (err0, err1, np.asarray(eff))
