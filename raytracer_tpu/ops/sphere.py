"""Batched ray–sphere intersection.

Same quadratic + near-then-far root selection as the reference
(Core/Sphere.cuh:18-47), vectorized over an [N]-ray wavefront × [S]
spheres. Root validity uses the reference's Interval::outOfInterval
semantics (`t < t_min || t > t_max` is invalid, Core/Interval.cuh:33-35).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import vecmath as vm

BIG = np.float32(3.0e38)


def intersect_spheres(origins, dirs, centers, radii, t_min, t_max):
    """Closest valid sphere hit per ray.

    origins/dirs: f32[N,3]; centers: f32[S,3]; radii: f32[S].
    t_min scalar; t_max: scalar or f32[N].
    Returns (t f32[N] (BIG when miss), sphere_id i32[N]).
    """
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origins.shape[:1])[:, None]

    oc = origins[:, None, :] - centers[None, :, :]            # [N,S,3]
    a = vm.dot(dirs, dirs)                                    # [N,1]
    half_b = jnp.sum(oc * dirs[:, None, :], axis=-1)          # [N,S]
    c = jnp.sum(oc * oc, axis=-1) - (radii * radii)[None, :]  # [N,S]
    disc = half_b * half_b - a * c
    ok = disc >= 0.0
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))

    root_near = (-half_b - sqrtd) / a
    root_far = (-half_b + sqrtd) / a
    near_ok = (root_near >= t_min) & (root_near <= t_max)
    far_ok = (root_far >= t_min) & (root_far <= t_max)
    root = jnp.where(near_ok, root_near, root_far)
    valid = ok & (near_ok | far_ok)

    t_all = jnp.where(valid, root, BIG)                       # [N,S]
    sphere_id = jnp.argmin(t_all, axis=-1).astype(jnp.int32)  # [N]
    t = jnp.take_along_axis(t_all, sphere_id[:, None], axis=-1)[:, 0]
    return t, sphere_id


def sphere_shade(origins, dirs, t, sphere_id, centers, radii, mat_ids):
    """Differentiable hit attributes for chosen spheres.

    Recomputes point and outward normal from the (detached) hit ids so
    gradients flow to sphere params; normal is flipped to face the ray
    (HitInfo::setFaceNormal, Core/HitInfo.cuh:15-18).
    Returns (point f32[N,3], normal f32[N,3], front_face bool[N], mat i32[N]).
    """
    center = centers[sphere_id]
    # Guard against the zero-radius sentinel sphere: its lanes are masked
    # out downstream, but a 0-divide here would leak NaNs through where().
    radius = jnp.where(radii[sphere_id] != 0.0, radii[sphere_id], 1.0)
    point = origins + t[:, None] * dirs
    outward = (point - center) / radius[:, None]
    front = vm.dot(dirs, outward, keepdims=False) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)
    return point, normal, front, mat_ids[sphere_id]
