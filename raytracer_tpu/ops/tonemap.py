"""Sky, gamma, and 8-bit packing.

Matches reference CRTUtility.cuh exactly: γ=2.0 via sqrt (:9-19),
clamp [0, 0.999] ×256 → RGBA8 (:21-32), vertical white→(0.5,0.7,1.0)
sky lerp on unit direction y (:34-38).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import vecmath as vm

SKY_TOP = np.asarray([0.5, 0.7, 1.0], np.float32)
SKY_BOTTOM = np.asarray([1.0, 1.0, 1.0], np.float32)


def sky_color(dirs: jnp.ndarray) -> jnp.ndarray:
    """Background gradient for miss rays (CRTUtility.cuh:34-38)."""
    unit = vm.normalize(dirs, eps=1e-20)
    t = 0.5 * (unit[..., 1:2] + 1.0)
    return (1.0 - t) * SKY_BOTTOM + t * SKY_TOP


def linear_to_gamma(c: jnp.ndarray) -> jnp.ndarray:
    """γ=2.0 (CRTUtility.cuh:9-19); non-positive clamps to 0."""
    return jnp.sqrt(jnp.maximum(c, 0.0))


def to_rgba8(linear_rgb: jnp.ndarray) -> jnp.ndarray:
    """f32[...,3] linear → u8[...,4] RGBA (CRTUtility.cuh:21-32)."""
    g = jnp.clip(linear_to_gamma(linear_rgb), 0.0, 0.999)
    rgb = (256.0 * g).astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)
