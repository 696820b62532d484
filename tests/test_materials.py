import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.materials import scatter
from raytracer_tpu.utils import rng as rngu
from raytracer_tpu.scene.types import DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN, METAL, Materials


def _mats():
    return Materials.from_lists(
        types=[LAMBERTIAN, METAL, DIELECTRIC, DIFFUSE_LIGHT, METAL],
        albedos=[(0.5, 0.4, 0.3), (0.7, 0.6, 0.5), (1, 1, 1), (0, 0, 0), (0.9, 0.9, 0.9)],
        emissions=[(0, 0, 0)] * 3 + [(5.0, 4.0, 3.0), (0, 0, 0)],
        roughnesses=[0.0, 0.0, 0.0, 0.0, 0.4],
        iors=[1.0, 1.0, 1.5, 1.0, 1.0],
    )


def _run(mat_index, n=4096, in_dir=(0.0, -1.0, 0.0), front=True, seed=0):
    """Normal is (0,1,0), always facing the incoming ray (the HitInfo
    setFaceNormal contract); `front` only selects the dielectric eta."""
    mats = _mats()
    d = jnp.tile(jnp.asarray([in_dir], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    mid = jnp.full((n,), mat_index, jnp.int32)
    ff = jnp.full((n,), front, bool)
    keys = rngu.lane_keys(jax.random.key(seed), jnp.arange(n, dtype=jnp.int32))
    return scatter(keys, d, nrm, ff, mid, mats)


def test_lambertian_cosine_lobe():
    res = _run(0)
    assert bool(jnp.all(res.scattered))
    np.testing.assert_allclose(np.asarray(res.attenuation)[0], [0.5, 0.4, 0.3], rtol=1e-6)
    dirs = np.asarray(res.direction)
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    # normal + unit_sphere sampling → cosine-weighted: E[cos θ] = 2/3.
    cos = unit[:, 1]
    assert cos.min() > -1e-6
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.02)


def test_metal_mirror_reflection():
    res = _run(1, in_dir=(1.0, -1.0, 0.0))
    dirs = np.asarray(res.direction)
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    expected = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    np.testing.assert_allclose(unit, np.tile(expected, (len(unit), 1)), atol=1e-5)
    assert bool(jnp.all(res.scattered))


def test_rough_metal_absorption_below_horizon():
    res = _run(4, in_dir=(1.0, -0.05, 0.0))  # grazing + roughness → some absorbed
    frac = float(jnp.mean(res.scattered))
    assert 0.0 < frac < 1.0


def test_dielectric_unit_attenuation_and_tir():
    res = _run(2)
    np.testing.assert_allclose(np.asarray(res.attenuation), 1.0, atol=1e-6)
    assert bool(jnp.all(res.scattered))
    # Total internal reflection: inside glass (front=False → eta=1.5),
    # grazing incidence → every ray reflects back off the interface
    # (positive y, same side it came from).
    res2 = _run(2, in_dir=(1.0, -0.1, 0.0), front=False)
    dirs = np.asarray(res2.direction)
    assert (dirs[:, 1] > 0).all()


def test_schlick_reflectance_statistics():
    # Normal incidence vacuum→glass: R0 = ((1-1.5)/(2.5))^2 = 0.04.
    res = _run(2, n=20000)
    dirs = np.asarray(res.direction)
    reflect_frac = (dirs[:, 1] > 0).mean()
    np.testing.assert_allclose(reflect_frac, 0.04, atol=0.01)


def test_light_emits_and_does_not_scatter():
    res = _run(3)
    assert not bool(jnp.any(res.scattered))
    assert bool(jnp.all(res.is_light))
    np.testing.assert_allclose(np.asarray(res.emission)[0], [5.0, 4.0, 3.0], rtol=1e-6)


def test_albedo_gradient_flows():
    mats = _mats()
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    nrm = jnp.asarray([[0.0, 1.0, 0.0]])

    def loss(albedo):
        m2 = Materials(mats.type, albedo, mats.emission, mats.roughness, mats.ior)
        keys = rngu.lane_keys(jax.random.key(0), jnp.arange(1, dtype=jnp.int32))
        res = scatter(keys, d, nrm, jnp.asarray([True]), jnp.asarray([0]), m2)
        return jnp.sum(res.attenuation)

    g = jax.grad(loss)(mats.albedo)
    assert np.asarray(g)[0].sum() == 3.0  # d(sum attn)/d(albedo row 0) = 1 per channel
