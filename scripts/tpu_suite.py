"""On-chip known-answer suite (VERDICT r4 next #6).

The pytest suite runs interpret-mode on the virtual CPU mesh by design
(tests/conftest.py; the single tunneled chip is wedge-prone and only one
process may use it). The bench preflight covers exactly ONE on-chip
configuration. This script is the missing complement: 12 known-answer
/ variant-equality cases run ON THE REAL CHIP, one subprocess per case
(a device fault kills only that case's process, like bench.py), results
recorded in TPU_SUITE_r05.json.

Cases (each compiles small shapes; the persistent compile cache makes
repeat runs fast):
  known-answer gates   : fused + wavefront preflight means vs the
                         committed CPU-exact values (assets/expected_preflight.json)
  variant equalities   : pallas-vs-packets traversal, blocked-vs-strip
                         packet footprints, host-chunked vs single
                         dispatch, spp-split accumulation, resumable
                         driver, mesh(1) sharded fused — each compared
                         per-pixel IN PROCESS against the default path
  env-flag variants    : LEAF_COND=0, VSTACK=1, UNROLL=2 — separate
                         subprocesses (import-time flags); the driver
                         compares their image sha256 against the default
                         case's hash (all three are bit-exact claims)

Usage:
  python scripts/tpu_suite.py            # run all cases, write JSON
  python scripts/tpu_suite.py --case X   # one case (worker mode)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXPECTED_FILE = os.path.join(REPO, "assets", "expected_preflight.json")
OUT_FILE = os.path.join(REPO, "TPU_SUITE_r05.json")
# Preflight shape: the bench gate's known-answer config (CPU-exact means
# committed in EXPECTED_FILE).
PF = dict(width=128, height=40, spp=2, max_bounces=12)
MEAN_RTOL = 0.02          # identical RNG streams; fp-only differences
CASE_TIMEOUT_S = 900      # first-ever compile of a shape can be slow


def _sha(img) -> str:
    import numpy as np

    return hashlib.sha256(np.asarray(img, np.float32).tobytes()).hexdigest()[:16]


def _maxabs(a, b) -> float:
    import numpy as np

    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _setup(**cfg_kw):
    """Common worker prologue: cache, scene (host-CPU build), config."""
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()
    import jax

    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scene.builder import reference_scene

    scene = reference_scene(assets_dir=os.path.join(REPO, "assets", "models"),
                            build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)
    kw = dict(PF)
    kw.update(cfg_kw)
    kw.setdefault("spp_per_pass", kw["spp"])
    cfg = RenderConfig(**kw)
    return scene, cfg, showcase_camera(cfg), jax.random.key(0)


def _expected():
    with open(EXPECTED_FILE) as f:
        return json.load(f)


# --------------------------------------------------------------------------
# Case workers. Each returns a dict with at least {"ok": bool}.
# --------------------------------------------------------------------------

def case_fused_known_answer():
    """Production backend vs the committed CPU-exact ktf mean."""
    import jax

    from raytracer_tpu.models.fused import render_image_fused

    scene, cfg, cam, key = _setup()
    img = render_image_fused(scene, cam, cfg, key)
    m = float(jax.device_get(img).mean())
    exp = _expected()["mean_rgb_ktf"]
    rel = abs(m - exp) / exp
    return {"ok": rel <= MEAN_RTOL, "mean": m, "expected": exp,
            "rel_err": rel, "hash": _sha(img)}


def case_wavefront_known_answer():
    """Wavefront + Pallas traversal vs the committed jax-stream mean."""
    import jax

    from raytracer_tpu.models.wavefront import render_image_wavefront

    scene, cfg, cam, key = _setup()
    img = render_image_wavefront(scene, cam, cfg, key)
    m = float(jax.device_get(img).mean())
    exp = _expected()["mean_rgb"]
    rel = abs(m - exp) / exp
    return {"ok": rel <= MEAN_RTOL, "mean": m, "expected": exp,
            "rel_err": rel, "hash": _sha(img)}


def case_backends_agree():
    """Pallas traversal kernel vs pure-XLA packet traversal ON CHIP.

    The interpret-mode tests prove exact agreement on CPU
    (tests/test_traverse equivalence family); this checks the REAL
    Mosaic compilation against the XLA compilation of the same math.
    The backend choice is read at trace time, so the jit caches must be
    cleared between the two renders.

    Pass criterion: across DIFFERENT compilers, per-pixel bitwise
    equality is not the invariant — an fp-contraction difference at a
    near-tie hit decision flips one ray onto a different PATH, an O(1)
    radiance change at that pixel (measured: exactly 1 px of 5120 at
    0.38, all others bit-identical, means within 1.4e-4). The on-chip
    invariant: ~all pixels identical, means agree."""
    import jax
    import numpy as np

    from raytracer_tpu.models.wavefront import render_image_wavefront

    scene, cfg, cam, key = _setup()
    os.environ["RAYTRACER_TPU_TRAVERSAL"] = "pallas"
    a = np.asarray(render_image_wavefront(scene, cam, cfg, key))
    jax.clear_caches()
    os.environ["RAYTRACER_TPU_TRAVERSAL"] = "packets"
    b = np.asarray(render_image_wavefront(scene, cam, cfg, key))
    d = np.max(np.abs(a - b), axis=-1)
    n_diff = int((d > 1e-5).sum())
    mean_rel = float(abs(a.mean() - b.mean()) / max(a.mean(), 1e-9))
    return {"ok": n_diff <= max(1, d.size // 1000) and mean_rel <= 2e-3,
            "max_abs_diff": float(d.max()),
            "px_differing_gt_1e5": n_diff, "px_total": int(d.size),
            "mean_rel_diff": mean_rel}


def case_footprint_equality():
    """32x32-block packet footprints vs 8x128 strip layout: the +4%
    layout (TILE_SHAPE_STUDY.json) must be bit-identical — ktf RNG is
    (pixel, sample, bounce)-keyed, so lane permutations cannot change
    any pixel's value."""
    import numpy as np

    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused
    from raytracer_tpu.schedule import blocked_pixel_grid

    scene, cfg, cam, key = _setup(width=128, height=64)

    def render(grid):
        px, py, inv = grid
        rgb = render_tiles_fused(scene, cam, cfg, key, px, py, spp=cfg.spp)
        return np.asarray(rgb[inv].reshape(cfg.height, cfg.width, 3))

    a = render(blocked_pixel_grid(cfg, 32, 32, 8, 16))
    b = render(_tiled_pixel_grid(cfg))
    d = float(np.max(np.abs(a - b)))
    return {"ok": d == 0.0, "max_abs_diff": d, "bit_identical": d == 0.0}


def case_chunk_equality():
    """Host-chunked dispatches (anti-wedge splitting, CLAUDE.md) vs one
    dispatch: per-packet results must be bitwise unchanged."""
    import numpy as np

    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    scene, cfg, cam, key = _setup()
    px, py, inv = _tiled_pixel_grid(cfg)
    one = np.asarray(render_tiles_fused(scene, cam, cfg, key, px, py,
                                        spp=cfg.spp, host_chunk_packets=None))
    chunked = np.asarray(render_tiles_fused(scene, cam, cfg, key, px, py,
                                            spp=cfg.spp, host_chunk_packets=2))
    d = float(np.max(np.abs(one - chunked)))
    return {"ok": d == 0.0, "max_abs_diff": d, "bit_identical": d == 0.0,
            "packets": int(px.shape[0] // 1024)}


def case_spp_split_equality():
    """spp accumulated across two sample-offset-keyed dispatches vs one
    spp-4 dispatch (the resumable path's keying invariant, on chip)."""
    import numpy as np

    from raytracer_tpu.models.fused import render_image_fused

    scene, cfg, cam, key = _setup(spp=4, spp_per_pass=4)
    one = np.asarray(render_image_fused(scene, cam, cfg, key))
    cfg2 = cfg.replace(spp_per_pass=2)
    split = np.asarray(render_image_fused(scene, cam, cfg2, key))
    d = float(np.max(np.abs(one - split)))
    return {"ok": d <= 1e-5, "max_abs_diff": d, "bit_identical": d == 0.0}


def case_resumable_equality():
    """Resumable fused driver (2-spp batches + checkpoint reload) vs the
    direct fused render; a second call must resume to the same image
    without re-rendering."""
    import tempfile

    import numpy as np

    from raytracer_tpu.io.checkpoint import render_image_resumable
    from raytracer_tpu.models.fused import render_image_fused

    scene, cfg, cam, key = _setup(spp=4, spp_per_pass=4)
    direct = np.asarray(render_image_fused(scene, cam, cfg, key))
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "ck.npz")
        r1 = np.asarray(render_image_resumable(scene, cam, cfg, key, ck,
                                               spp_per_batch=2,
                                               integrator="fused"))
        t0 = time.perf_counter()
        r2 = np.asarray(render_image_resumable(scene, cam, cfg, key, ck,
                                               spp_per_batch=2,
                                               integrator="fused"))
        resume_s = time.perf_counter() - t0
    d1 = float(np.max(np.abs(direct - r1)))
    d2 = float(np.max(np.abs(r1 - r2)))
    return {"ok": d1 <= 1e-5 and d2 == 0.0, "max_abs_diff_vs_direct": d1,
            "resume_noop_diff": d2, "resume_noop_s": round(resume_s, 3)}


def case_sharded_mesh1():
    """render_image_fused_sharded over a 1-device mesh (the only mesh
    this chip offers) vs the unsharded fused render: shard_map plumbing
    must be transparent."""
    import numpy as np

    from raytracer_tpu.models.fused import render_image_fused
    from raytracer_tpu.parallel.sharding import (make_mesh,
                                                 render_image_fused_sharded)

    scene, cfg, cam, key = _setup()
    plain = np.asarray(render_image_fused(scene, cam, cfg, key))
    sharded = np.asarray(render_image_fused_sharded(scene, cam, cfg, key,
                                                    mesh=make_mesh()))
    d = float(np.max(np.abs(plain - sharded)))
    return {"ok": d == 0.0, "max_abs_diff": d, "bit_identical": d == 0.0}


def case_interleave_g2():
    """G=2 merged path loops (the quarantined ops/pallas_interleave
    experiment, default-off): chain decisions depend only on chain
    state, so per-packet results must equal the G=1 kernel EXACTLY —
    here verified with the REAL Mosaic compilation, not interpret mode
    (tests/test_fused_megakernel.py:141 covers CPU)."""
    import numpy as np

    from raytracer_tpu.models.wavefront import _tiled_pixel_grid
    from raytracer_tpu.ops.pallas_megakernel import render_tiles_fused

    scene, cfg, cam, key = _setup(width=128, height=64)
    px, py, _ = _tiled_pixel_grid(cfg)
    a = np.asarray(render_tiles_fused(scene, cam, cfg, key, px, py,
                                      spp=cfg.spp, interleave=1))
    b = np.asarray(render_tiles_fused(scene, cam, cfg, key, px, py,
                                      spp=cfg.spp, interleave=2))
    d = float(np.max(np.abs(a - b)))
    return {"ok": d == 0.0, "max_abs_diff": d, "bit_identical": d == 0.0}


def _env_variant_case():
    """Fused preflight render under an import-time kernel flag; the
    DRIVER compares the hash against case_fused_known_answer (all these
    flags are bit-exact-equality claims)."""
    import jax

    from raytracer_tpu.models.fused import render_image_fused

    scene, cfg, cam, key = _setup()
    img = render_image_fused(scene, cam, cfg, key)
    m = float(jax.device_get(img).mean())
    exp = _expected()["mean_rgb_ktf"]
    rel = abs(m - exp) / exp
    return {"ok": rel <= MEAN_RTOL, "mean": m, "rel_err": rel,
            "hash": _sha(img)}


# name -> (worker fn, env overrides, bit-exact-vs-default claim)
CASES = {
    "fused_known_answer": (case_fused_known_answer, {}, False),
    "wavefront_known_answer": (case_wavefront_known_answer, {}, False),
    "backends_agree": (case_backends_agree, {}, False),
    "footprint_blocked_vs_strip": (case_footprint_equality, {}, False),
    "chunked_vs_single_dispatch": (case_chunk_equality, {}, False),
    "spp_split_accumulation": (case_spp_split_equality, {}, False),
    "resumable_fused": (case_resumable_equality, {}, False),
    "sharded_fused_mesh1": (case_sharded_mesh1, {}, False),
    "interleave_g2": (case_interleave_g2, {}, False),
    "leaf_cond_off": (_env_variant_case, {"RAYTRACER_TPU_LEAF_COND": "0"}, True),
    "vstack_on": (_env_variant_case, {"RAYTRACER_TPU_VSTACK": "1"}, True),
    "unroll2": (_env_variant_case, {"RAYTRACER_TPU_UNROLL": "2"}, True),
}


def worker(name: str) -> int:
    fn, env, _claim = CASES[name]
    # Apply the case's env overrides here too (not only in the driver's
    # subprocess env), so running a single case standalone tests the
    # intended variant: the kernel flags are read at raytracer_tpu
    # import time, which happens inside fn via _setup.
    os.environ.update(env)
    res = fn()
    res["name"] = name
    print(json.dumps(res))
    return 0 if res.get("ok") else 1


def driver() -> int:
    me = os.path.abspath(__file__)
    results = []
    default_hash = None
    for name, (_fn, env, bit_claim) in CASES.items():
        print(f"# case {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            p = subprocess.run([sys.executable, "-u", me, "--case", name],
                               capture_output=True, text=True,
                               timeout=CASE_TIMEOUT_S,
                               env={**os.environ, **env})
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            res = json.loads(lines[-1]) if lines else {
                "name": name, "ok": False,
                "error": f"exit {p.returncode}; no JSON",
                "stderr_tail": p.stderr[-800:]}
        except subprocess.TimeoutExpired:
            res = {"name": name, "ok": False,
                   "error": f"timeout {CASE_TIMEOUT_S}s"}
        res["seconds"] = round(time.perf_counter() - t0, 1)
        if name == "fused_known_answer":
            default_hash = res.get("hash")
        if bit_claim:
            match = (res.get("hash") == default_hash
                     and default_hash is not None)
            res["matches_default_image"] = match
            res["ok"] = bool(res.get("ok")) and match
        results.append(res)
        print(f"#   {'PASS' if res.get('ok') else 'FAIL'} "
              f"({res['seconds']}s) {json.dumps({k: v for k, v in res.items() if k not in ('name', 'ok', 'seconds')})}",
              file=sys.stderr, flush=True)
    out = {
        "round": 5,
        "suite": "on-chip known-answer + variant-equality (VERDICT r4 #6)",
        "preflight_shape": PF,
        "passed": sum(1 for r in results if r.get("ok")),
        "total": len(results),
        "cases": results,
    }
    with open(OUT_FILE, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("passed", "total")}))
    return 0 if out["passed"] == out["total"] else 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        sys.exit(worker(sys.argv[2]))
    sys.exit(driver())
