"""Two-level acceleration split (builder.partition_brute_faces):
oversized triangles (Cornell walls/boxes/light) are brute-forced while
the BVH covers only the dense mesh. Every traversal backend must agree
exactly, and the split must preserve original face ids/materials."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops import intersect as isect
from raytracer_tpu.scene import builder


@pytest.fixture(scope="module")
def scene():
    return builder.reference_scene(assets_dir="assets/models", build_bvh=True)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    n = 4096  # >= PACKET_MIN_RAYS so packet/pallas dispatch engages
    o = jnp.asarray(rng.uniform(-0.28, 0.28, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def test_partition_selects_cornell_tris(scene):
    b4 = scene.bvh4
    assert b4.brute_tri is not None
    nb = int(np.asarray(b4.brute_prim).shape[0])
    assert nb % 8 == 0 and nb <= 64 + 8
    # Brute prim ids are original Cornell face ids (the first 32 faces
    # of the concatenated mesh are the box; the bunny follows).
    real = np.asarray(b4.brute_prim)[:32]
    assert set(real.tolist()) == set(range(32))
    # Tree prim ids cover exactly the remaining faces.
    tree_ids = set(np.asarray(b4.prim_index).tolist())
    t = np.asarray(scene.mesh.faces).shape[0]
    assert set(range(32, t)).issubset(tree_ids)


def test_backends_agree_on_two_level_scene(scene, rays):
    o, d = rays
    res = {}
    for be in ("lane", "packets", "pallas"):
        os.environ["RAYTRACER_TPU_TRAVERSAL"] = be
        try:
            ids = isect.intersect_scene(scene, o, d, 1e-3)
        finally:
            del os.environ["RAYTRACER_TPU_TRAVERSAL"]
        res[be] = (np.asarray(ids.t), np.asarray(ids.prim_id),
                   np.asarray(ids.prim_type))
    t0, p0, y0 = res["lane"]
    assert (t0 < 1e30).mean() > 0.8  # interior rays: nearly all hit
    for be in ("packets", "pallas"):
        t1, p1, y1 = res[be]
        np.testing.assert_allclose(t1, t0, rtol=1e-5)
        np.testing.assert_array_equal(p1, p0)
        np.testing.assert_array_equal(y1, y0)


def test_fused_trace_two_level_materials(scene, rays):
    """The in-kernel brute pre-pass must return the Cornell materials
    (in particular the ceiling light) — a regression guard for the
    wavefront path going dark."""
    o, d = rays
    fh = isect.trace_frame_fused(scene, o, d, 1e-3, interpret=True)
    ids = isect.intersect_scene(scene, o, d, 1e-3)
    attrs = isect.shade_hit(scene, o, d, ids)
    hit = np.asarray(ids.hit)
    np.testing.assert_array_equal(np.asarray(fh.hit), hit)
    from raytracer_tpu.ops import materials as mat_ops

    params = mat_ops.lookup_params(scene.materials, attrs.mat_id)
    np.testing.assert_array_equal(np.asarray(fh.params.mtype)[hit],
                                  np.asarray(params.mtype)[hit])
    # Some rays must see the emissive ceiling light.
    assert (np.asarray(fh.params.emission)[hit].sum(axis=1) > 0).any()


def test_interior_showcase_brightness(scene):
    """End-to-end guard for the headline workload: a tiny interior
    render through the fused Pallas path (interpret) must land in a
    sane radiance band — a dark frame means the light/material routing
    through the kernel broke (regression seen only on-TPU 2026-08-18:
    mean 0.27 → 0.04)."""
    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.wavefront import render_image_wavefront

    # >= PACKET_MIN_RAYS lanes so the fused Pallas path engages.
    cfg = RenderConfig(width=128, height=40, spp=2, max_bounces=12)
    cam = showcase_camera(cfg)
    os.environ["RAYTRACER_TPU_TRAVERSAL"] = "pallas"
    try:
        img = np.asarray(render_image_wavefront(scene, cam, cfg, jax.random.key(0)))
    finally:
        del os.environ["RAYTRACER_TPU_TRAVERSAL"]
    m = img.mean()
    assert 0.1 < m < 0.8, m
    # Ceiling-light pixels blow out well above the walls.
    assert img.max() > 2.0, img.max()
