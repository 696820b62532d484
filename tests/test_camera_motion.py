import jax.numpy as jnp
import numpy as np

from raytracer_tpu.camera import make_camera
from raytracer_tpu.camera_motion import (
    MouseSmoother,
    adjust_focus,
    move,
    rotate,
)


def test_wasd_moves_along_basis():
    cam = make_camera(aspect_ratio=1.0)  # front=(0,0,1), right=(-1,0,0)
    c2 = move(cam, "w", dt=2.0)  # W = -front (reference inversion)
    np.testing.assert_allclose(np.asarray(c2.position), [0, 4, 2], atol=1e-5)
    c3 = move(cam, "d", dt=1.0)
    np.testing.assert_allclose(np.asarray(c3.position), [-1, 4, 4], atol=1e-5)
    c4 = move(cam, " ", dt=0.5)
    np.testing.assert_allclose(np.asarray(c4.position), [0, 4.5, 4], atol=1e-5)


def test_rotate_sensitivity_and_clamp():
    cam = make_camera(aspect_ratio=1.0)
    c2 = rotate(cam, dx_px=10.0, dy_px=0.0)
    np.testing.assert_allclose(float(c2.yaw), -90.0 - 2.0, atol=1e-5)  # 0.2°/px inverted
    c3 = rotate(cam, dx_px=0.0, dy_px=-1000.0)
    assert float(c3.pitch) == 89.0  # clamped


def test_focus_adjust_floor():
    cam = make_camera(aspect_ratio=1.0)
    c2 = adjust_focus(cam, -100.0)
    np.testing.assert_allclose(float(c2.focus_dist), 0.1, atol=1e-6)


def test_mouse_smoother_first_sample_is_zero():
    sm = MouseSmoother()
    assert sm.update(100, 100) == (0.0, 0.0)
    dx, dy = sm.update(110, 100)
    assert 0 < dx <= 10 and dy == 0.0  # smoothed toward the new point
    sm.release()
    assert sm.update(0, 0) == (0.0, 0.0)
