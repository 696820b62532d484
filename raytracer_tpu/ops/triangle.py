"""Batched Möller–Trumbore ray–triangle intersection.

Same algorithm and tolerances as the reference
(Core/Mesh.cuh:266-308): EPSILON=1e-8 determinant cutoff, u/v barycentric
rejection, t accepted on the *closed* interval [t_min, t_max], geometric
(face) normal from cross(e1,e2) flipped toward the ray — smooth vertex
normals are deliberately NOT used, matching the reference's behavior
(SURVEY.md §6.2 item 8).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import vecmath as vm

EPSILON = 1e-8
BIG = np.float32(3.0e38)


def _tri_edges(vertices, faces):
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    return v0, v1 - v0, v2 - v0


def intersect_tris_brute(origins, dirs, vertices, faces, t_min, t_max):
    """All-pairs [N rays × T tris] intersection; use only for small T
    (the LBVH path in ops/traverse.py is the scaling path).

    Returns (t f32[N] (BIG on miss), tri_id i32[N]).
    """
    v0, e1, e2 = _tri_edges(vertices, faces)      # [T,3]
    return _brute_edges(origins, dirs, v0, e1, e2, t_min, t_max)


def intersect_packed_brute(origins, dirs, tri9, t_min, t_max):
    """All-pairs against PACKED (v0,e1,e2) triangles f32[T,9] — the
    Bvh4.brute_tri two-level set. Returns (t, slot) with slot indexing
    tri9 (map through brute_prim/brute_mat for original ids)."""
    return _brute_edges(origins, dirs, tri9[:, 0:3], tri9[:, 3:6], tri9[:, 6:9],
                        t_min, t_max)


def _brute_edges(origins, dirs, v0, e1, e2, t_min, t_max):
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origins.shape[:1])[:, None]

    d = dirs[:, None, :]                          # [N,1,3]
    h = jnp.cross(d, e2[None, :, :])              # [N,T,3]
    a = jnp.sum(e1[None, :, :] * h, axis=-1)      # [N,T]
    ok = jnp.abs(a) >= EPSILON
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = origins[:, None, :] - v0[None, :, :]      # [N,T,3]
    u = f * jnp.sum(s * h, axis=-1)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(s, e1[None, :, :])              # [N,T,3]
    v = f * jnp.sum(d * q, axis=-1)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * jnp.sum(e2[None, :, :] * q, axis=-1)
    ok &= (t >= t_min) & (t <= t_max)

    t_all = jnp.where(ok, t, BIG)
    tri_id = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_all, tri_id[:, None], axis=-1)[:, 0]
    return t_best, tri_id


def intersect_tri_single(origins, dirs, v0, e1, e2, t_min, t_max):
    """Per-ray single-triangle test where each ray has its own triangle
    (v0/e1/e2 are [N,3]): the inner op of BVH leaf processing.

    Returns (valid bool[N], t f32[N]).
    """
    h = jnp.cross(dirs, e2)
    a = jnp.sum(e1 * h, axis=-1)
    ok = jnp.abs(a) >= EPSILON
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = origins - v0
    u = f * jnp.sum(s * h, axis=-1)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(dirs * q, axis=-1)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok &= (t >= t_min) & (t <= t_max)
    return ok, jnp.where(ok, t, BIG)


def tri_shade(origins, dirs, tri_id, vertices, faces, face_mat, face_uvs=None):
    """Differentiable hit attributes for chosen triangles.

    Recomputes t from the (detached) triangle id via the same
    Möller–Trumbore algebra so gradients flow to `vertices`; returns the
    reference's geometric front-facing normal (Core/Mesh.cuh:303-305)
    and the barycentric hit coordinate (the reference's HitInfo carries
    U_TexCoord/V_TexCoord fields, Core/HitInfo.cuh:12-13 — declared but
    never written since Texture.cuh is dead code; here they're live:
    barycentric (u,v) by default, interpolated per-corner OBJ vt when
    `face_uvs` f32[T,3,2] is provided — the texture-hook extension).

    Returns (t f32[N], point f32[N,3], normal f32[N,3], front bool[N],
    mat i32[N], uv f32[N,2]).
    """
    f3 = faces[tri_id]
    v0 = vertices[f3[:, 0]]
    e1 = vertices[f3[:, 1]] - v0
    e2 = vertices[f3[:, 2]] - v0

    h = jnp.cross(dirs, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) >= EPSILON, a, 1.0)
    s = origins - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(dirs * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)

    point = origins + t[:, None] * dirs
    geom_n = vm.normalize(jnp.cross(e1, e2), eps=1e-20)
    front = vm.dot(dirs, geom_n, keepdims=False) < 0.0
    normal = jnp.where(front[:, None], geom_n, -geom_n)
    if face_uvs is None:
        uv = jnp.stack([u, v], axis=-1)
    else:
        c = face_uvs[tri_id]  # [N,3,2] per-corner vt
        uv = (1.0 - u - v)[:, None] * c[:, 0] + u[:, None] * c[:, 1] + v[:, None] * c[:, 2]
    return t, point, normal, front, face_mat[tri_id], uv
