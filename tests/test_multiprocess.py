"""True multi-process jax.distributed test (2 CPU processes), matching
SURVEY.md §4 item 4's multi-host requirement. Spawns two workers that
render the image sharded over the global 2-device mesh and checks the
all-gathered result against a single-process render."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "multihost_cpu_demo.py")
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
           "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")}
    procs = [
        subprocess.Popen(
            [sys.executable, script, coordinator, "2", str(rank), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    img = np.load(os.path.join(tmp_path, "multihost_img.npy"))

    # Single-process reference (this process: 8 virtual devices, but the
    # pixel-keyed RNG makes the result device-count invariant).
    import jax

    from raytracer_tpu.camera import make_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import render_image
    from raytracer_tpu.scene.builder import cornell_spheres_scene

    scene = cornell_spheres_scene()
    cfg = RenderConfig(width=16, height=8, spp=2, max_bounces=3)
    cam = make_camera(aspect_ratio=cfg.aspect_ratio, fov_degrees=cfg.fov_degrees,
                      aperture=cfg.aperture)
    ref = np.asarray(render_image(scene, cam, cfg, jax.random.key(7)))
    np.testing.assert_array_equal(img, ref)
