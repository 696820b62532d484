"""Build scenes on a host CPU backend, then ship them to the device.

Scene construction (OBJ parsing, LBVH/SAH builds, table packing) is
PREPROCESSING — dozens of small eager jnp ops and one-off jits. Through
the tunneled TPU backend every one of those is a fresh XLA compile at
~30-60 s each when the compile service is cold/degraded (measured
2026-08-21: an eager `jnp.sum` took 44.7 s), which is exactly why bench
workers and the driver entry used to hang for minutes before the first
real dispatch. The reference pays none of this: its scene build is host
C++ plus three `<<<1,1>>>` kernels (SceneManager.h:77-98).

`with_host_cpu_backend()` makes a CPU backend available ALONGSIDE the
default platform (jax_platforms "axon,cpu" — the default device stays
the TPU), and `build_on_host(fn)` runs a builder under
`jax.default_device(cpu)` and device_puts the resulting pytree to the
default device in one transfer.
"""

from __future__ import annotations

import os


def host_cpu_device():
    """The host CPU device, adding 'cpu' to jax_platforms if needed.
    Returns None when no CPU backend can be made available (e.g. the
    backend was already initialized without one).

    ORDER MATTERS: the config update must happen BEFORE any device
    probe — `jax.local_devices(backend="cpu")` under a pinned
    single-platform list initializes the backend registry without a CPU
    entry, after which the update is too late (measured: the fallback
    silently rebuilt the bench scene through the tunnel, 500 s)."""
    import jax

    try:
        cur = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if cur and "cpu" not in cur.split(","):
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        # Losing the host-CPU fast path means every eager scene-build op
        # compiles through the TPU tunnel (~45 s each when the compile
        # service is cold; the r3 bench timeouts were exactly this) —
        # never lose it silently (ADVICE r4).
        import warnings

        warnings.warn(
            "hostbuild: no CPU backend available — scene builds will run "
            "through the default (tunnel) device, which can cost minutes "
            "of eager compiles when the compile cache is cold")
        return None


def build_on_host(build_fn, *args, **kwargs):
    """Run `build_fn(*args, **kwargs)` with eager ops/jits on the host
    CPU backend, then move the resulting pytree to the default device.
    Falls back to a plain call when no CPU backend is available or the
    default device already is the CPU."""
    import jax

    cpu = host_cpu_device()
    default = jax.devices()[0]
    if cpu is None or default.platform == "cpu":
        return build_fn(*args, **kwargs)
    with jax.default_device(cpu):
        out = build_fn(*args, **kwargs)
        out = jax.block_until_ready(out)
    return jax.device_put(out, default)
