"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "camera_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, ...}

Workload: the reference's headline scene — Cornell box + bunny-scale
mesh (~82k tris) at 2K (2560×1440), camera INSIDE the box matching the
reference's published screenshot (every pixel hits geometry, paths only
terminate via the ceiling light / RR / 20-bounce cap), traced with the
wavefront integrator over the two-level native SAH BVH4 — the same
geometry/shading work per camera ray as the reference's "high quality"
mode (README.md:11: 2K/2000spp "takes several minutes" on an RTX 3050
Ti ⇒ ~12-41 M camera rays/s; BASELINE.md). Per-ray cost is
spp-invariant, so we time a fixed spp slice and report camera
rays/second/chip. vs_baseline is against the 25 M rays/s midpoint of
the reference estimate.

Trustworthiness (VERDICT r1): the whole measurement runs in WORKER
subprocesses (a TPU device fault wedges the JAX client, so in-process
retries are useless); each worker first renders a small PRE-FLIGHT
frame and hard-compares its mean radiance against the committed
CPU-exact value (assets/expected_preflight.json) — a silent miscompile
(the 2026-08-18 6x-dark episode) aborts the bench instead of reporting
a plausible-looking rays/s. The full-frame mean is also banded against
the preflight expectation. If the Pallas traversal path keeps faulting,
the driver falls back to the XLA-packets backend (slower but identical
radiance) and records which backend produced the number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_RAYS_PER_SEC = 25.0e6  # BASELINE.md derived midpoint (12-41 M)
EXPECTED_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "assets", "expected_preflight.json")
# Pre-flight known-answer frame (CPU-exact value committed in
# EXPECTED_FILE; regenerate with scripts/make_expected_preflight.py).
PREFLIGHT = dict(width=128, height=40, spp=2, max_bounces=12)
PREFLIGHT_RTOL = 0.02   # identical RNG streams; fp-only differences
FULL_BAND = 0.15        # full frame vs preflight mean (resolution shift)
EXIT_CORRECTNESS = 3

# "fused" = the whole path loop in ONE Pallas kernel (ktf counter RNG,
# ops/pallas_megakernel.py) — the fastest backend; "pallas" = per-bounce
# traversal kernel under the XLA wavefront; "packets" = pure-XLA
# traversal (slow but kernel-free) as the last-resort fallback.
BACKENDS = ("fused", "pallas", "packets")
ATTEMPTS_PER_BACKEND = 3
WORKER_TIMEOUT_S = 560


def _build(width, height, spp, bounces, spp_per_pass):
    from raytracer_tpu.config import RenderConfig

    return RenderConfig(width=width, height=height, spp=spp,
                        max_bounces=bounces, spp_per_pass=spp_per_pass)


def worker(backend: str) -> int:
    os.environ["RAYTRACER_TPU_TRAVERSAL"] = (
        "pallas" if backend == "fused" else backend)
    from raytracer_tpu.utils import jaxcache

    jaxcache.enable()

    import jax

    from raytracer_tpu.camera import showcase_camera
    from raytracer_tpu.models.fused import render_image_fused
    from raytracer_tpu.models.wavefront import render_image_wavefront
    from raytracer_tpu.scene.builder import reference_scene

    platform = jax.devices()[0].platform

    scene = reference_scene(assets_dir="assets/models", build_bvh=True)
    jax.block_until_ready(scene.bvh4.bounds)

    def render_cfg(cfg, cam, key):
        if backend == "fused":
            return render_image_fused(scene, cam, cfg, key)
        return render_image_wavefront(scene, cam, cfg, key)

    # --- Pre-flight known-answer gate. ---------------------------------
    with open(EXPECTED_FILE) as f:
        expected = json.load(f)
    pf_cfg = _build(spp_per_pass=PREFLIGHT["spp"], bounces=PREFLIGHT["max_bounces"],
                    **{k: PREFLIGHT[k] for k in ("width", "height", "spp")})
    pf_cam = showcase_camera(pf_cfg)
    pf = render_cfg(pf_cfg, pf_cam, jax.random.key(0))
    pf_mean = float(pf.mean())
    # The fused kernel draws from the ktf counter stream — a different
    # (equally valid) RNG stream than jax.random, so its Monte-Carlo
    # mean gates against the CPU-exact ktf expected value.
    exp_mean = float(expected["mean_rgb_ktf"] if backend == "fused"
                     else expected["mean_rgb"])
    rel = abs(pf_mean - exp_mean) / exp_mean
    print(f"# preflight mean_rgb={pf_mean:.6f} expected={exp_mean:.6f} "
          f"rel={rel:.4f}", file=sys.stderr, flush=True)
    if rel > PREFLIGHT_RTOL:
        print(f"# CORRECTNESS FAILURE: preflight radiance off by {rel:.1%} "
              f"(miscompile?) — refusing to report rays/s", file=sys.stderr)
        return EXIT_CORRECTNESS

    # --- Timed full-workload runs. --------------------------------------
    if platform == "cpu":  # smoke fallback (proves the harness runs)
        width, height, spp, bounces = 64, 36, 1, 2
    else:
        width, height, spp, bounces = 2560, 1440, 8, 20
    # spp_per_pass == spp: ONE dispatch per frame. Splitting into 2-spp
    # passes costs ~1.3x — each pass pays its own wavefront drain tail
    # (scripts/frame_breakdown.py: spp8/mb20 2.14M rays/s vs spp2 1.65M).
    # A 2K/8spp dispatch is ~7-14 s, which the tunnel tolerates.
    cfg = _build(width, height, spp, bounces, spp_per_pass=spp)
    cam = showcase_camera(cfg)

    def render(key):
        return render_cfg(cfg, cam, key)

    float(render(jax.random.key(0)).mean())  # warmup / compile
    times = []
    fails = 0
    m = 0.0
    i = 0
    # Best-of-4: tunnel dispatch latency has multi-second slow PHASES
    # (same program measured 8.2-10.5 s across one session); extra
    # samples keep the reported best from landing on a slow phase.
    while len(times) < 4 and i < 8:
        i += 1
        try:
            t0 = time.perf_counter()
            m = float(render(jax.random.key(i)).mean())
            times.append(time.perf_counter() - t0)
        except Exception as e:  # tunnel flake mid-run: count and go on
            fails += 1
            print(f"# timed run {i} failed ({type(e).__name__})", file=sys.stderr)
            time.sleep(20)
    if not times:
        print("# no timed run succeeded — no rays/s to report", file=sys.stderr)
        return 1

    # Full-frame radiance band vs the preflight expectation (same view;
    # resolution shifts the mean only slightly — catches gross
    # miscompiles at the bench shape).
    full_rel = abs(m - exp_mean) / exp_mean
    if full_rel > FULL_BAND:
        print(f"# CORRECTNESS FAILURE: full-frame mean {m:.4f} deviates "
              f"{full_rel:.1%} from expected {exp_mean:.4f}", file=sys.stderr)
        return EXIT_CORRECTNESS

    dt = min(times)
    rays_per_sec = width * height * spp / dt
    print(f"# platform={platform} {width}x{height} spp={spp} bounces={bounces} "
          f"best={dt:.3f}s times={['%.3f' % t for t in times]} "
          f"failed_runs={fails} mean_rgb={m:.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "camera_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
        "backend": backend,
        "timed_runs_ok": len(times),
        "timed_runs_failed": fails,
        "mean_rgb": round(m, 5),
        "preflight_rel_err": round(rel, 5),
    }))
    return 0


def driver() -> int:
    me = os.path.abspath(__file__)
    for backend in BACKENDS:
        for attempt in range(ATTEMPTS_PER_BACKEND):
            print(f"# bench attempt backend={backend} try={attempt}",
                  file=sys.stderr, flush=True)
            try:
                p = subprocess.run(
                    [sys.executable, "-u", me, "--worker", backend],
                    capture_output=True, text=True, timeout=WORKER_TIMEOUT_S)
            except subprocess.TimeoutExpired:
                print("# worker timed out; retrying", file=sys.stderr)
                continue
            sys.stderr.write(p.stderr)
            out_lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and out_lines:
                print(out_lines[-1])
                return 0
            if p.returncode == EXIT_CORRECTNESS:
                # Miscompile on this backend — retrying won't help;
                # fall through to the next backend.
                print(f"# backend {backend} failed the correctness gate",
                      file=sys.stderr)
                break
            time.sleep(30)
    print("# bench: all backends exhausted without a trustworthy number",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        sys.exit(worker(sys.argv[2]))
    sys.exit(driver())
