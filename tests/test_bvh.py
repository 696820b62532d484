"""LBVH invariants + traversal ≡ brute-force equivalence
(SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops.bvh import build_lbvh, morton3d
from raytracer_tpu.ops.traverse import intersect_bvh
from raytracer_tpu.ops.triangle import intersect_tris_brute
from raytracer_tpu.scene.types import TriMesh


def _random_mesh(t=150, v=200, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    verts = jax.random.uniform(k1, (v, 3), minval=-1, maxval=1)
    faces = jax.random.randint(k2, (t, 3), 0, v).astype(jnp.int32)
    return TriMesh(vertices=verts, faces=faces, face_mat=jnp.zeros((t,), jnp.int32))


def test_morton_orders_axes():
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.9]])
    codes = np.asarray(morton3d(pts))
    assert codes[0] < codes[2] < codes[1]


def test_parent_box_contains_children():
    mesh = _random_mesh()
    bvh = build_lbvh(mesh)
    n_int = bvh.left.shape[0]
    nmin, nmax = np.asarray(bvh.node_min), np.asarray(bvh.node_max)
    left, right = np.asarray(bvh.left), np.asarray(bvh.right)
    for i in range(n_int):
        for c in (left[i], right[i]):
            assert (nmin[i] <= nmin[c] + 1e-6).all(), (i, c)
            assert (nmax[i] >= nmax[c] - 1e-6).all(), (i, c)


def test_every_leaf_reachable_exactly_once():
    mesh = _random_mesh()
    bvh = build_lbvh(mesh)
    t = mesh.num_tris
    n_int = t - 1
    seen = np.zeros(t, int)
    stack = [0]
    while stack:
        node = stack.pop()
        if node >= n_int:
            seen[node - n_int] += 1
        else:
            stack.append(int(bvh.left[node]))
            stack.append(int(bvh.right[node]))
    assert (seen == 1).all()
    # prim_index is a permutation.
    assert sorted(np.asarray(bvh.prim_index).tolist()) == list(range(t))


@pytest.mark.parametrize("seed", [0, 1])
def test_traversal_matches_brute_force(seed):
    mesh = _random_mesh(seed=seed)
    bvh = build_lbvh(mesh)
    k1, k2 = jax.random.split(jax.random.key(100 + seed))
    o = jax.random.uniform(k1, (256, 3), minval=-3, maxval=3)
    d = jax.random.normal(k2, (256, 3))
    tb, ib = intersect_tris_brute(o, d, mesh.vertices, mesh.faces, 1e-3, 3e38)
    tv, iv = intersect_bvh(o, d, mesh, bvh, 1e-3, 3e38)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(tb), rtol=1e-5)
    hit = np.asarray(tb) < 1e30
    np.testing.assert_array_equal(np.asarray(iv)[hit], np.asarray(ib)[hit])


def test_traversal_respects_t_max_pruning():
    mesh = _random_mesh()
    bvh = build_lbvh(mesh)
    o = jnp.zeros((64, 3)) - 2.0
    d = jax.random.normal(jax.random.key(5), (64, 3))
    t_full, _ = intersect_bvh(o, d, mesh, bvh, 1e-3, 3e38)
    cap = jnp.full((64,), 1.5, jnp.float32)
    t_cap, _ = intersect_bvh(o, d, mesh, bvh, 1e-3, cap)
    tf, tc = np.asarray(t_full), np.asarray(t_cap)
    # Hits beyond the cap disappear; hits inside are preserved.
    assert ((tc > 1e30 - 1) | (tc <= 1.5 + 1e-6)).all()
    inside = tf <= 1.5
    np.testing.assert_allclose(tc[inside], tf[inside], rtol=1e-6)


def test_duplicate_centroids_and_degenerate_tris():
    """Equal Morton codes (index tie-break) and zero-area triangles must
    not break the build or traversal."""
    verts = jnp.asarray(
        [[0.0, 0.0, 5.0], [1.0, 0.0, 5.0], [0.0, 1.0, 5.0]] * 4, jnp.float32
    )
    faces = jnp.asarray([[3 * i, 3 * i + 1, 3 * i + 2] for i in range(4)], jnp.int32)
    # last face degenerate (all same vertex)
    faces = jnp.concatenate([faces, jnp.asarray([[0, 0, 0]], jnp.int32)])
    mesh = TriMesh(vertices=verts, faces=faces, face_mat=jnp.zeros((5,), jnp.int32))
    bvh = build_lbvh(mesh)
    o = jnp.asarray([[0.2, 0.2, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, _ = intersect_bvh(o, d, mesh, bvh, 1e-3, 3e38)
    np.testing.assert_allclose(t[0], 5.0, rtol=1e-6)
