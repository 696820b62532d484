"""Counter-based RNG properties that the parity/sharding story rests on."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import rng as rngu


def test_lane_position_independence():
    """Draw for pixel p is identical whether p appears in a full batch or
    any sub-batch — the property that makes chunked/sharded renders
    bit-identical."""
    base = jax.random.key(42)
    ids = jnp.arange(100, dtype=jnp.int32)
    full = rngu.uniform(rngu.lane_keys(base, ids), rngu.P_RR)
    sub = rngu.uniform(rngu.lane_keys(base, ids[37:53]), rngu.P_RR)
    np.testing.assert_array_equal(np.asarray(full)[37:53], np.asarray(sub))


def test_purposes_decorrelated():
    base = jax.random.key(0)
    keys = rngu.lane_keys(base, jnp.arange(4096, dtype=jnp.int32))
    a = np.asarray(rngu.uniform(keys, rngu.P_RR))
    b = np.asarray(rngu.uniform(keys, rngu.P_DIELECTRIC))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05


def test_unit_vector_distribution():
    keys = rngu.lane_keys(jax.random.key(1), jnp.arange(8192, dtype=jnp.int32))
    v = np.asarray(rngu.random_unit_vector(keys, rngu.P_SCATTER_UNIT))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniform on sphere: each component mean ~0, E[x^2]=1/3.
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=0.03)
    np.testing.assert_allclose((v**2).mean(axis=0), 1 / 3, atol=0.02)


def test_disk_distribution():
    keys = rngu.lane_keys(jax.random.key(2), jnp.arange(8192, dtype=jnp.int32))
    p = np.asarray(rngu.random_in_unit_disk(keys, rngu.P_RAYGEN_LENS))
    r2 = p[:, 0] ** 2 + p[:, 1] ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    assert (p[:, 2] == 0).all()
    # Uniform on disk: E[r^2] = 1/2.
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.02)
