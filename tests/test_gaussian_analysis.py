"""MultivariateNormal (gbp_multivariate_normal parity) + analysis metrics +
message counters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magics_tpu.analysis import distance_travelled, ldj, perpendicular_path_deviation
from magics_tpu.core.gaussian import MultivariateNormal, NotPositiveSemiDefinite
from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import build_scenario, circle_formation


# ---- MultivariateNormal (gbp_multivariate_normal/src/lib.rs tests) --------

def test_mvn_roundtrip_mean_cov():
    mean = jnp.array([1.0, -2.0, 0.5])
    cov = jnp.array([[2.0, 0.3, 0.0], [0.3, 1.0, 0.1], [0.0, 0.1, 0.5]])
    g = MultivariateNormal.from_mean_and_covariance(mean, cov)
    np.testing.assert_allclose(np.asarray(g.mean()), mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.covariance()), cov, rtol=1e-5, atol=1e-12)


def test_mvn_from_information():
    lam = jnp.eye(2) * 4.0
    eta = jnp.array([4.0, 8.0])
    g = MultivariateNormal.from_information_and_precision(eta, lam)
    np.testing.assert_allclose(np.asarray(g.mean()), [1.0, 2.0], rtol=1e-6)
    assert g.dims == 2


def test_mvn_product_is_information_sum():
    a = MultivariateNormal.from_mean_and_precision(jnp.array([0.0]), jnp.eye(1))
    b = MultivariateNormal.from_mean_and_precision(jnp.array([2.0]), jnp.eye(1))
    c = a * b
    # product of N(0,1) and N(2,1) has mean 1, precision 2
    np.testing.assert_allclose(np.asarray(c.mean()), [1.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.precision_matrix()), [[2.0]])
    d = c / b
    np.testing.assert_allclose(np.asarray(d.mean()), [0.0], atol=1e-6)


def test_mvn_singular_rejected():
    with pytest.raises(NotPositiveSemiDefinite):
        MultivariateNormal.from_mean_and_covariance(
            jnp.zeros(2), jnp.zeros((2, 2))
        )


# ---- analysis metrics -----------------------------------------------------

def test_distance_travelled_straight_line():
    pos = np.stack([np.linspace(0, 10, 11), np.zeros(11)], axis=1)
    assert abs(distance_travelled(pos) - 10.0) < 1e-9


def test_path_deviation_zero_on_path():
    wps = np.array([[0.0, 0.0], [10.0, 0.0]])
    pos = np.stack([np.linspace(0, 10, 21), np.zeros(21)], axis=1)
    assert perpendicular_path_deviation(pos, wps) < 1e-12
    off = pos + np.array([0.0, 2.0])
    assert abs(perpendicular_path_deviation(off, wps) - 2.0) < 1e-9


def test_ldj_lower_for_jerkier_motion():
    # LDJ = -log(jerk integral scaled): jerkier motion -> more negative
    ts = np.linspace(0.0, 10.0, 101)
    smooth = np.stack([np.full(101, 5.0), np.zeros(101)], axis=1)
    rng = np.random.default_rng(0)
    jerky = smooth + rng.normal(0, 1.0, smooth.shape)
    assert ldj(jerky, ts) < ldj(smooth + 1e-9 * rng.normal(size=smooth.shape), ts)


# ---- message counters -----------------------------------------------------

def test_message_counts_accumulate():
    specs = circle_formation(4, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=4, external=2,
        n_slots=4, comms_radius=60.0, comms_failure_rate=0.0,
    )
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(5):
        state = step(state, sdf, params)
    counts = np.asarray(state.msg_counts)
    V = params.n_vars
    # internal sent == internal received, > 0 once active
    assert (counts[:, 0] > 0).all()
    np.testing.assert_array_equal(counts[:, 0], counts[:, 2])
    # per active tick, each robot's internal factor+variable messages:
    # factor pass 2(V-1)+(V-2)+(V-2), variable responses the same (plus
    # inter-robot responses when connected)
    per_slot = 2 * (2 * (V - 1) + 2 * (V - 2))
    n_int = sum(1 for i, _ in params.schedule if i)
    # 4 active ticks (spawn happens in tick 1's activate phase)
    assert counts[0, 0] >= 4 * n_int * per_slot
    # robots within comms radius exchanged external messages
    assert (counts[:, 1] > 0).all()
    assert (counts[:, 3] > 0).all()
