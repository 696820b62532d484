"""BVH4 (wide-node) traversal ≡ brute force / binary LBVH."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops.bvh import build_lbvh
from raytracer_tpu.ops.bvh4 import build_bvh4, intersect_bvh4, MAX_LEAF
from raytracer_tpu.ops.triangle import intersect_tris_brute
from raytracer_tpu.scene.types import TriMesh


def _random_mesh(t=300, v=220, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    verts = jax.random.uniform(k1, (v, 3), minval=-1, maxval=1)
    faces = jax.random.randint(k2, (t, 3), 0, v).astype(jnp.int32)
    return TriMesh(vertices=verts, faces=faces, face_mat=jnp.zeros((t,), jnp.int32))


@pytest.mark.parametrize("seed,t", [(0, 300), (1, 37), (2, 5), (3, 2)])
def test_bvh4_matches_brute_force(seed, t):
    mesh = _random_mesh(t=t, seed=seed)
    b4 = build_bvh4(mesh, build_lbvh(mesh))
    k1, k2 = jax.random.split(jax.random.key(50 + seed))
    o = jax.random.uniform(k1, (256, 3), minval=-3, maxval=3)
    d = jax.random.normal(k2, (256, 3))
    tb, ib = intersect_tris_brute(o, d, mesh.vertices, mesh.faces, 1e-3, 3e38)
    tv, iv = intersect_bvh4(o, d, b4, 1e-3, 3e38)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(tb), rtol=1e-5)
    hit = np.asarray(tb) < 1e30
    np.testing.assert_array_equal(np.asarray(iv)[hit], np.asarray(ib)[hit])


def test_bvh4_leaf_ranges_cover_all_triangles():
    mesh = _random_mesh(t=211)
    b4 = build_bvh4(mesh, build_lbvh(mesh))
    children = np.asarray(b4.children)
    prim = np.asarray(b4.prim_index)
    covered = np.zeros(211, int)  # original-face coverage via prim_index
    for c in children.reshape(-1):
        if c <= -2:
            code = -c - 2
            lo, cnt = code // 8, code % 8 + 1
            assert cnt <= MAX_LEAF
            assert lo % 8 == 0  # leaf rows are 8-aligned (one table row)
            for s in range(lo, lo + cnt):
                covered[prim[s]] += 1
    assert (covered == 1).all()
    assert np.asarray(b4.tri).shape[0] % 8 == 0


def test_bvh4_respects_t_max():
    mesh = _random_mesh()
    b4 = build_bvh4(mesh, build_lbvh(mesh))
    o = jnp.zeros((64, 3)) - 2.0
    d = jax.random.normal(jax.random.key(5), (64, 3))
    t_full, _ = intersect_bvh4(o, d, b4, 1e-3, 3e38)
    t_cap, _ = intersect_bvh4(o, d, b4, 1e-3, jnp.full((64,), 1.5))
    tf, tc = np.asarray(t_full), np.asarray(t_cap)
    assert ((tc > 1e30 - 1) | (tc <= 1.5 + 1e-6)).all()
    inside = tf <= 1.5
    np.testing.assert_allclose(tc[inside], tf[inside], rtol=1e-6)
