import numpy as np
import jax.numpy as jnp

from ramp_tpu.core.normalization import (
    LimitsNormalizer, GaussianNormalizer, DatasetNormalizer, flatten_field,
)


def test_limits_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.uniform(-3, 5, size=(100, 16, 4)).astype(np.float32)
    norm = LimitsNormalizer.fit(data)
    z = norm.normalize(jnp.asarray(data))
    assert float(jnp.max(z)) <= 1.0 + 1e-6
    assert float(jnp.min(z)) >= -1.0 - 1e-6
    back = norm.unnormalize(z)
    np.testing.assert_allclose(np.asarray(back), data, rtol=1e-4, atol=1e-4)


def test_limits_unnormalize_clips():
    norm = LimitsNormalizer(mins=jnp.zeros(2), maxs=jnp.ones(2))
    out = norm.unnormalize(jnp.asarray([[2.0, -2.0]]))
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0]])


def test_gaussian_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.normal(3.0, 2.0, size=(500, 4)).astype(np.float32)
    norm = GaussianNormalizer.fit(data)
    z = np.asarray(norm.normalize(jnp.asarray(data)))
    assert abs(z.mean()) < 1e-3
    assert abs(z.std() - 1.0) < 1e-2


def test_flatten_rules():
    assert flatten_field(np.zeros((5, 3))).shape == (5, 3)
    assert flatten_field(np.zeros((5, 7, 3))).shape == (35, 3)
    assert flatten_field(np.zeros((2, 5, 7, 3))).shape == (70, 3)


def test_dataset_normalizer_keys():
    fields = {"traj": np.random.rand(10, 8, 4), "task": np.random.rand(10, 4)}
    dn = DatasetNormalizer(fields)
    z = dn.normalize(jnp.asarray(fields["traj"]), "traj")
    assert z.shape == (10, 8, 4)
    back = dn.unnormalize(z, "traj")
    np.testing.assert_allclose(np.asarray(back), fields["traj"], rtol=1e-4, atol=1e-4)


def test_safe_limits_normalizer_handles_constant_dims():
    """SafeLimitsNormalizer (ref :170-185) widens degenerate dims so a
    constant column cannot produce inf/NaN; it is registry-reachable."""
    from ramp_tpu.core.normalization import NORMALIZERS, DatasetNormalizer

    x = np.stack([np.linspace(-1, 1, 8), np.zeros(8)], axis=-1)  # col 1 const
    n = NORMALIZERS["SafeLimitsNormalizer"].fit(x)
    out = np.asarray(n.normalize(x))
    assert np.isfinite(out).all()
    rt = np.asarray(n.unnormalize(n.normalize(x)))
    np.testing.assert_allclose(rt, x, atol=1e-6)

    dn = DatasetNormalizer({"traj": x}, "SafeLimitsNormalizer")
    assert np.isfinite(np.asarray(dn.normalize(x, "traj"))).all()
    assert "FixedLimitsNormalizer" in NORMALIZERS


def test_unnormalize_tolerance_matches_reference():
    """ref :152-160: values within (1, 1+eps] pass through UNclipped; the
    whole array is clipped only when some element exceeds the tolerance."""
    from ramp_tpu.core.normalization import LimitsNormalizer

    n = LimitsNormalizer(mins=np.asarray([0.0]), maxs=np.asarray([10.0]))
    # borderline: 1 + 5e-5 within eps=1e-4 -> unnormalizes beyond maxs
    out = float(np.asarray(n.unnormalize(jnp.asarray([1.0 + 5e-5]))))
    assert out > 10.0
    # beyond tolerance -> the whole array is clipped
    out2 = np.asarray(n.unnormalize(jnp.asarray([1.0 + 5e-5, 1.01])))
    assert out2.max() <= 10.0 + 1e-6
