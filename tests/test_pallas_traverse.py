"""Pallas packet-traversal kernel ≡ brute force (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops.bvh import build_lbvh
from raytracer_tpu.ops.bvh4 import build_bvh4
from raytracer_tpu.ops.pallas_traverse import intersect_bvh4_pallas
from raytracer_tpu.ops.triangle import intersect_tris_brute
from raytracer_tpu.scene.types import TriMesh


def _random_mesh(t=300, v=220, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    verts = jax.random.uniform(k1, (v, 3), minval=-1, maxval=1)
    faces = jax.random.randint(k2, (t, 3), 0, v).astype(jnp.int32)
    return TriMesh(vertices=verts, faces=faces, face_mat=jnp.zeros((t,), jnp.int32))


@pytest.mark.parametrize("seed,sort", [(0, True), (1, False)])
def test_pallas_matches_brute_force(seed, sort):
    mesh = _random_mesh(seed=seed)
    b4 = build_bvh4(mesh, build_lbvh(mesh))
    k1, k2 = jax.random.split(jax.random.key(50 + seed))
    n = 2048  # 2 packets
    o = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3)
    d = jax.random.normal(k2, (n, 3))
    tb, ib = intersect_tris_brute(o, d, mesh.vertices, mesh.faces, 1e-3, 3e38)
    tv, iv = intersect_bvh4_pallas(o, d, b4, 1e-3, 3e38, sort=sort, interpret=True)
    # rtol 1e-4: the kernel's scalar-broadcast MT evaluation associates
    # fp ops differently from the [N,T] brute force.
    np.testing.assert_allclose(np.asarray(tv), np.asarray(tb), rtol=1e-4)
    hit = np.asarray(tb) < 1e30
    np.testing.assert_array_equal(np.asarray(iv)[hit], np.asarray(ib)[hit])


def test_pallas_respects_t_max_and_padding():
    mesh = _random_mesh()
    b4 = build_bvh4(mesh, build_lbvh(mesh))
    n = 1500  # non-multiple of 1024 → exercises padding
    k1, k2 = jax.random.split(jax.random.key(7))
    o = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3)
    d = jax.random.normal(k2, (n, 3))
    t_full, _ = intersect_bvh4_pallas(o, d, b4, 1e-3, 3e38, interpret=True)
    cap = jnp.full((n,), 1.5)
    t_cap, _ = intersect_bvh4_pallas(o, d, b4, 1e-3, cap, interpret=True)
    tf, tc = np.asarray(t_full), np.asarray(t_cap)
    assert ((tc > 1e30 - 1) | (tc <= 1.5 + 1e-6)).all()
    inside = tf <= 1.5
    np.testing.assert_allclose(tc[inside], tf[inside], rtol=1e-6)
