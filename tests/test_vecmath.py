import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import vecmath as vm


def test_dot_cross_normalize():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[4.0, -5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vm.dot(a, b, keepdims=False), [12.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(vm.cross(a, b)[1], [0.0, 0.0, -1.0], rtol=1e-6)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.length(n, keepdims=False), [1.0, 1.0], rtol=1e-6)


def test_reflect():
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-7)


def test_refract_matches_snell():
    # 45° incidence from vacuum into n=1.5: sin θt = sin 45° / 1.5.
    uv = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vm.refract(uv, n, jnp.asarray([[1.0 / 1.5]]))
    out_unit = np.asarray(vm.normalize(out))[0]
    sin_t = abs(out_unit[0])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)
    assert out_unit[1] < 0  # continues into the surface


def test_near_zero():
    v = jnp.asarray([[1e-9, 1e-9, 1e-9], [1e-3, 0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(vm.near_zero(v))[:, 0], [True, False])
