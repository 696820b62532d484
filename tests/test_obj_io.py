"""OBJ/MTL loading + SceneManager consolidation-semantics tests."""

import math
import os

import numpy as np
import pytest

from raytracer_tpu.scene.assets import ensure_assets, write_cornell_box
from raytracer_tpu.scene.obj_io import MtlMaterial, infer_material, load_obj, load_scene_objs
from raytracer_tpu.scene.types import DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN, METAL


def test_material_inference_priority():
    """SceneManager.h:222-247: emissive > translucent > specular > diffuse."""
    m = MtlMaterial(emission=(1, 0, 0), dissolve=0.5, specular=(1, 0, 0))
    assert infer_material(m).type == DIFFUSE_LIGHT
    m = MtlMaterial(dissolve=0.5, specular=(1, 0, 0), ior=1.33)
    md = infer_material(m)
    assert md.type == DIELECTRIC and md.ior == pytest.approx(1.33)
    m = MtlMaterial(specular=(0.8, 0, 0), shininess=96.0)
    md = infer_material(m)
    assert md.type == METAL
    assert md.roughness == pytest.approx(math.sqrt(2.0 / 98.0))
    m = MtlMaterial(specular=(0.8, 0, 0), roughness=0.3)
    assert infer_material(m).roughness == pytest.approx(0.3)
    assert infer_material(MtlMaterial()).type == LAMBERTIAN


def test_cornell_asset_loads(tmp_path):
    p = os.path.join(tmp_path, "cornell.obj")
    write_cornell_box(p)
    mats = []
    mesh = load_obj(p, mats)
    assert len(mats) == 8
    assert sum(m.type == DIFFUSE_LIGHT for m in mats) == 1
    # 6 quads (2 tris each) + 2 boxes × 5 quads × 2 tris = 32 tris.
    assert len(mesh.faces) == 32
    assert mesh.face_material_ids.min() >= 0
    assert mesh.face_material_ids.max() == 7


def test_quad_triangulation_fan(tmp_path):
    p = os.path.join(tmp_path, "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj(p, [])
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_joint_renormalization_quirk(tmp_path):
    """SceneManager.h:307-325: normalization reruns over all meshes on
    each load; final joint bounds have max extent 0.6 centered at 0."""
    a = os.path.join(tmp_path, "a.obj")
    b = os.path.join(tmp_path, "b.obj")
    with open(a, "w") as f:
        f.write("v 0 0 0\nv 2 0 0\nv 0 2 0\nf 1 2 3\n")
    with open(b, "w") as f:
        f.write("v 10 0 0\nv 12 0 0\nv 10 2 0\nf 1 2 3\n")
    mesh, _ = load_scene_objs([a, b])
    v = np.asarray(mesh.vertices)
    mn, mx = v.min(0), v.max(0)
    np.testing.assert_allclose((mx - mn).max(), 0.6, rtol=1e-5)
    np.testing.assert_allclose((mn + mx) / 2, 0.0, atol=1e-6)


def test_bunny_material_offset_quirk():
    """The material-less bunny's faces get id = unique-material-count of
    the Cornell mesh (SceneManager.h:143-145,177) — pointing one past the
    OBJ material table, i.e. at the ground material once the hardcoded
    spheres are appended (CUDAKernels.h:69-70)."""
    paths = ensure_assets("assets/models")
    mesh, mats = load_scene_objs([paths["cornell"], paths["bunny"]])
    assert mats.count == 8
    face_mat = np.asarray(mesh.face_mat)
    assert face_mat[:32].max() == 7         # cornell faces within table
    assert (face_mat[32:] == 8).all()       # bunny → first post-OBJ material


def test_negative_indices_and_vt_vn(tmp_path):
    p = os.path.join(tmp_path, "neg.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nf -3/1/1 -2/2/2 -1/3/3\n")
    mesh = load_obj(p, [])
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


def test_unknown_usemtl_falls_back_to_zero(tmp_path):
    p = os.path.join(tmp_path, "u.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nusemtl missing\nf 1 2 3\n")
    mesh = load_obj(p, [])
    # unknown material → -1 → clamped to 0 (SceneManager.h:262-264 analog)
    np.testing.assert_array_equal(mesh.face_material_ids, [0])


def test_vertex_normals_uvs_roundtrip(tmp_path):
    """vn/vt lines are loaded into per-corner TriMesh attributes
    (reference loads them per-vertex, SceneManager.h:280-289 +
    Core/Mesh.cuh:5-10; shading stays geometric for parity)."""
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/2 4/4/2\n")
    mesh, _ = load_scene_objs([str(obj)])
    assert mesh.num_tris == 2  # fan triangulation
    n = np.asarray(mesh.normals)
    uv = np.asarray(mesh.uvs)
    assert n.shape == (2, 3, 3) and uv.shape == (2, 3, 2)
    # Triangle 0 = corners (1,2,3): vn (1,1,2), vt (1,2,3).
    np.testing.assert_allclose(n[0], [[0, 0, 1], [0, 0, 1], [0, 1, 0]])
    np.testing.assert_allclose(uv[0], [[0, 0], [1, 0], [1, 1]])
    # Triangle 1 = corners (1,3,4): vn (1,2,2), vt (1,3,4).
    np.testing.assert_allclose(n[1], [[0, 0, 1], [0, 1, 0], [0, 1, 0]])
    np.testing.assert_allclose(uv[1], [[0, 0], [1, 1], [0, 1]])


def test_missing_vn_vt_yields_none(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    mesh, _ = load_scene_objs([str(obj)])
    assert mesh.normals is None and mesh.uvs is None


def test_negative_vn_indices_and_mixed_presence(tmp_path):
    """Negative vn indices resolve relative to the pool; corners without
    a vn slot get zero rows."""
    obj = tmp_path / "mix.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 1 0 0\nvn 0 1 0\n"
        "f 1//-1 2//-2 3\n")
    mesh, _ = load_scene_objs([str(obj)])
    n = np.asarray(mesh.normals)
    np.testing.assert_allclose(n[0, 0], [0, 1, 0])   # -1 -> last vn
    np.testing.assert_allclose(n[0, 1], [1, 0, 0])   # -2 -> first vn
    np.testing.assert_allclose(n[0, 2], [0, 0, 0])   # absent -> zeros
