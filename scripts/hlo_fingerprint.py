"""Fingerprint the LOWERED fused-megakernel program (incl. the Mosaic
kernel payload embedded in the tpu_custom_call) so source-level diets
can PROVE the compiled production body is unchanged: the kernel's
default-off machinery (PREFETCH / LEAF_ROWS / interleave) is gated by
STATIC Python flags, so removing it must not change the trace at all.

Usage: python scripts/hlo_fingerprint.py   (prints one sha256 line)
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from raytracer_tpu.utils import jaxcache

jaxcache.enable()

import jax

from raytracer_tpu.camera import showcase_camera
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.fused import _fused_pixel_grid
from raytracer_tpu.scene.builder import reference_scene


def main():
    cfg = RenderConfig(width=128, height=40, spp=2, max_bounces=12,
                       spp_per_pass=2)
    cam = showcase_camera(cfg)
    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    px, py, _ = _fused_pixel_grid(cfg)

    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    def fn(key):
        return render_tiles_fused(scene, cam, cfg, key, px, py, spp=2,
                                  interpret=False)

    lowered = jax.jit(fn).lower(jax.random.key(0))
    text = lowered.as_text()
    digest = hashlib.sha256(text.encode()).hexdigest()
    print(f"fused-lowered sha256={digest} bytes={len(text)}")


if __name__ == "__main__":
    main()
