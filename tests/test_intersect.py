import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import sphere as sph
from raytracer_tpu.ops import triangle as tri
from raytracer_tpu.ops.intersect import intersect_scene, shade_hit, PRIM_SPHERE, PRIM_TRI
from raytracer_tpu.scene.types import Materials, Scene, Spheres, TriMesh

BIG = 1e30


def test_sphere_closed_form():
    # Ray from origin along +z at a unit sphere centered (0,0,5): hits t=4.
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, sid = sph.intersect_spheres(o, d, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]), 1e-3, BIG)
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-6)
    assert sid[0] == 0


def test_sphere_inside_far_root():
    # Origin inside the sphere → near root negative, far root selected.
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, _ = sph.intersect_spheres(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([2.0]), 1e-3, BIG)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)


def test_sphere_unnormalized_direction():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 2.0]])  # |d|=2 → t halves
    t, _ = sph.intersect_spheres(o, d, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]), 1e-3, BIG)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)


def test_triangle_hit_and_barycentric_reject():
    verts = jnp.asarray([[0.0, 0.0, 5.0], [2.0, 0.0, 5.0], [0.0, 2.0, 5.0]])
    faces = jnp.asarray([[0, 1, 2]])
    o = jnp.asarray([[0.5, 0.5, 0.0], [1.9, 1.9, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, tid = tri.intersect_tris_brute(o, d, verts, faces, 1e-3, BIG)
    np.testing.assert_allclose(t[0], 5.0, rtol=1e-6)
    assert t[1] > 1e29  # outside u+v<=1


def test_triangle_parallel_miss():
    verts = jnp.asarray([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0], [0.0, 1.0, 5.0]])
    faces = jnp.asarray([[0, 1, 2]])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to triangle plane
    t, _ = tri.intersect_tris_brute(o, d, verts, faces, 1e-3, BIG)
    assert t[0] > 1e29


def _tiny_scene():
    mats = Materials.from_lists(types=[0, 0], albedos=[(0.5, 0.5, 0.5), (0.8, 0.2, 0.2)])
    spheres = Spheres.from_lists(centers=[(0.0, 0.0, 5.0)], radii=[1.0], mat_ids=[0])
    # Winding chosen so cross(e1,e2) points -z, toward the ray origin.
    mesh = TriMesh.from_arrays(
        vertices=[(-5, -5, 3.0), (5, -5, 3.0), (0, 5, 3.0)],
        faces=[(0, 2, 1)],
        face_mat=[1],
    )
    return Scene(materials=mats, spheres=spheres, mesh=mesh)


def test_scene_closest_hit_prefers_triangle():
    scene = _tiny_scene()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    ids = intersect_scene(scene, o, d, 1e-3)
    assert bool(ids.hit[0])
    np.testing.assert_allclose(ids.t[0], 3.0, rtol=1e-6)
    assert ids.prim_type[0] == PRIM_TRI
    attrs = shade_hit(scene, o, d, ids)
    assert attrs.mat_id[0] == 1
    np.testing.assert_allclose(attrs.normal[0], [0.0, 0.0, -1.0], atol=1e-6)
    assert bool(attrs.front_face[0])


def test_scene_sphere_behind_triangle():
    scene = _tiny_scene()
    # Ray offset beyond the triangle's extent in x hits only the sphere? No —
    # triangle spans ±5. Shoot from behind the triangle toward the sphere.
    o = jnp.asarray([[0.0, 0.0, 3.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    ids = intersect_scene(scene, o, d, 1e-3)
    assert ids.prim_type[0] == PRIM_SPHERE
    np.testing.assert_allclose(ids.t[0], 0.5, rtol=1e-5)


def test_hit_uv_triangle_barycentric():
    """shade_hit returns the Möller–Trumbore barycentric (u,v) of the hit
    (HitInfo.cuh:12-13 analog): u along v0→v1, v along v0→v2."""
    verts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    mesh = TriMesh.from_arrays(verts, faces, [0])
    scene = Scene(
        materials=Materials.from_lists([0], [[0.5, 0.5, 0.5]]),
        spheres=Spheres.empty(),
        mesh=mesh,
    )
    # Aim at barycentric (u,v) = (0.25, 0.5) from z = +1, straight down.
    o = jnp.asarray([[0.25, 0.5, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    ids = intersect_scene(scene, o, d, 1e-3)
    assert bool(ids.hit[0]) and int(ids.prim_type[0]) == PRIM_TRI
    attrs = shade_hit(scene, o, d, ids)
    np.testing.assert_allclose(np.asarray(attrs.uv[0]), [0.25, 0.5], atol=1e-6)


def test_hit_uv_interpolated_from_obj_vt():
    """With per-corner vt present, uv is the barycentric interpolation of
    the corner uvs (texture-hook extension)."""
    verts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    corner_uv = [[[0.0, 0.0], [2.0, 0.0], [0.0, 4.0]]]  # vt per corner
    mesh = TriMesh.from_arrays(verts, faces, [0], uvs=corner_uv)
    scene = Scene(
        materials=Materials.from_lists([0], [[0.5, 0.5, 0.5]]),
        spheres=Spheres.empty(),
        mesh=mesh,
    )
    o = jnp.asarray([[0.25, 0.5, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    ids = intersect_scene(scene, o, d, 1e-3)
    attrs = shade_hit(scene, o, d, ids)
    # (1-u-v)*c0 + u*c1 + v*c2 = 0.25*[2,0] + 0.5*[0,4] = [0.5, 2.0]
    np.testing.assert_allclose(np.asarray(attrs.uv[0]), [0.5, 2.0], atol=1e-6)


def test_hit_uv_sphere_latlon():
    """Sphere hit UV is the standard latitude/longitude parameterization."""
    scene = Scene(
        materials=Materials.from_lists([0], [[0.5, 0.5, 0.5]]),
        spheres=Spheres.from_lists([[0.0, 0.0, 0.0]], [1.0], [0]),
        mesh=TriMesh.empty(),
    )
    # Hit the sphere's +x pole from outside: outward normal (1,0,0)
    # → phi = atan2(0, 1) + pi = pi → u = 0.5; theta = acos(0) → v = 0.5.
    o = jnp.asarray([[2.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    ids = intersect_scene(scene, o, d, 1e-3)
    assert bool(ids.hit[0]) and int(ids.prim_type[0]) == PRIM_SPHERE
    attrs = shade_hit(scene, o, d, ids)
    np.testing.assert_allclose(np.asarray(attrs.uv[0]), [0.5, 0.5], atol=1e-6)
