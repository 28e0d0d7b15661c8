"""Pallas APF kernel vs the XLA reference implementation (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.guidance.apf import apf_static_batch
from ramp_tpu.guidance.apf_pallas import apf_static_batch_pallas


def _case(b=4, h=16, n=96, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    traj = jax.random.uniform(k1, (b, h, 4), minval=-1, maxval=1)
    pts = jax.random.uniform(k2, (n, 2), minval=-0.8, maxval=0.8)
    return traj, pts


def test_pallas_matches_xla_reference():
    traj, pts = _case()
    ref = apf_static_batch(traj, pts, 0.3, 0.1, 7)
    out = apf_static_batch_pallas(traj, pts, 0.3, 0.1, 7, interpret=True)
    # near-equidistant obstacle points may resolve to a different (equally
    # valid) nearest neighbor between argmin and the one-hot contraction;
    # the force difference is bounded by float epsilon on the distance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_pallas_no_force_when_far():
    traj, pts = _case(seed=3)
    # threshold so small nothing collides -> identity
    out = apf_static_batch_pallas(traj, pts, 1e-6, 0.1, 7, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(traj), atol=1e-6)


def test_pallas_pushes_away_from_point():
    # one obstacle point at the origin; a waypoint sitting on it gets pushed
    traj = jnp.zeros((1, 8, 4)).at[0, 3, :2].set(jnp.asarray([0.05, 0.0]))
    pts = jnp.zeros((1, 2))
    out = apf_static_batch_pallas(traj, pts, 0.2, 0.1, 3, interpret=True)
    # waypoint 3 moved further from the origin along +x
    assert float(out[0, 3, 0]) > 0.05
    # velocities untouched
    np.testing.assert_allclose(np.asarray(out[..., 2:]),
                               np.asarray(traj[..., 2:]), atol=1e-6)
