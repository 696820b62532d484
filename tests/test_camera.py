import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.camera import camera_basis, generate_rays, make_camera
from raytracer_tpu.utils import rng as rngu


def _keys(px, py, w, seed=0):
    return rngu.lane_keys(jax.random.key(seed), py * w + px)


def test_default_camera_basis_matches_reference_convention():
    """yaw=-90/pitch=0 → front=(0,0,1); the camera at (0,4,4) therefore
    *views* along -front = -Z (Core/Camera.cuh:24-25,159-165 — the ctor
    ignores the target)."""
    cam = make_camera(aspect_ratio=16 / 9)
    basis = camera_basis(cam)
    np.testing.assert_allclose(basis["front"], [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(basis["right"], [-1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(basis["up"], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(cam.focus_dist, np.sqrt(32.0), rtol=1e-6)


def test_center_ray_direction():
    """The ray through the image center goes along -front (toward -Z),
    with |dir| ≈ focus distance (unnormalized, Core/Camera.cuh:40-43)."""
    cam = make_camera(aspect_ratio=1.0, fov_degrees=80.0, aperture=0.0)
    w = h = 101
    px = jnp.asarray([50], jnp.int32)
    py = jnp.asarray([50], jnp.int32)
    o, d = generate_rays(cam, px, py, w, h, _keys(px, py, w))
    np.testing.assert_allclose(np.asarray(o)[0], [0, 4, 4], atol=1e-5)
    dn = np.asarray(d)[0]
    # Center ± half-pixel jitter: direction dominated by -Z.
    assert dn[2] < 0
    center_frac = abs(dn[0]) / abs(dn[2])
    assert center_frac < 0.05


def test_rays_span_viewport():
    cam = make_camera(aspect_ratio=1.0, fov_degrees=90.0, aperture=0.0)
    w = h = 64
    px = jnp.asarray([0, 63], jnp.int32)
    py = jnp.asarray([0, 63], jnp.int32)
    _, d = generate_rays(cam, px, py, w, h, _keys(px, py, w, seed=1))
    d = np.asarray(d)
    # fov 90 → viewport half-extent = focus_dist; corners ~±45°.
    assert d[0][1] < 0 and d[1][1] > 0  # bottom vs top
    # horizontal axis points -X (reference mirrored-u quirk)
    assert d[0][0] > 0 and d[1][0] < 0


def test_camera_is_differentiable():
    cam = make_camera(aspect_ratio=1.0)
    px = jnp.arange(4, dtype=jnp.int32)
    py = jnp.arange(4, dtype=jnp.int32)

    def loss(fov):
        cam2 = jax.tree_util.tree_map(lambda x: x, cam)
        cam2 = cam2.__class__(**{**cam2.__dict__, "fov_degrees": fov})
        _, d = generate_rays(cam2, px, py, 4, 4, _keys(px, py, 4))
        return jnp.sum(d * d)

    g = jax.grad(loss)(jnp.asarray(80.0))
    assert np.isfinite(g) and g != 0.0
