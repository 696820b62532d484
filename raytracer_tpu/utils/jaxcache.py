"""Persistent XLA compilation cache setup.

First-compile latency through the TPU tunnel is tens of seconds; the
persistent cache makes every recompile of a known (program, shape) pair
near-instant across processes. Called by the CLI, bench, and driver
entry points before first device use.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None, host_cpu: bool = True) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "RAYTRACER_TPU_JAX_CACHE", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if host_cpu:
        # Make a host CPU backend available ALONGSIDE the default
        # platform while the backend is still uninitialized, so scene
        # builders can run off-tunnel (utils/hostbuild.py).
        from raytracer_tpu.utils import hostbuild

        hostbuild.host_cpu_device()
