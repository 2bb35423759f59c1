"""float32 numerical stability of the GBP tick.

Regression for the Schur cancellation-noise blow-up: in f32, an empty-cavity
marginal leaves roundoff of order eps * ||potential|| in the message
precision; without the relative floor in
`magics_tpu.core.linalg.marginalize_two_block`, interior variables turn
spuriously "valid" at startup, tracking factors linearise at garbage means,
and velocities explode to hundreds of m/s (observed on the Solo GP scenario).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from magics_tpu.core.linalg import marginalize_two_block
from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import RobotSpec, build_scenario


def _multi_waypoint_spec(speed: float) -> RobotSpec:
    """A single robot following a 6-point zig-zag path (the RRT*-fed shape)."""
    pts = np.array(
        [[-40.0, -40.0], [-35.0, -20.0], [-10.0, -18.0], [-12.0, 5.0],
         [20.0, 8.0], [40.0, 40.0]]
    )
    poses = []
    for a, b in zip(pts, np.vstack([pts[1:], pts[-1:]])):
        d = b - a
        n = np.linalg.norm(d)
        v = d / n * speed if n > 0 else np.zeros(2)
        poses.append(np.concatenate([a, v]))
    poses[-1][2:] = poses[-2][2:]
    return RobotSpec(start=poses[0], waypoints=np.stack(poses), radius=2.0)


def test_f32_tick_velocities_bounded():
    speed = 7.0
    spec = _multi_waypoint_spec(speed)
    params, state, sdf = build_scenario(
        [spec], target_speed=speed, planning_horizon=5.0, hz=10.0,
        internal=10, external=10, n_slots=2, dtype=jnp.float32,
        world=(120.0, 120.0),
    )
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(60):
        state = step(state, sdf, params)
    vel = np.abs(np.asarray(state.belief_mean)[0, :, 2:])
    assert np.isfinite(vel).all()
    # transients overshoot target speed slightly; 4x is far below the
    # hundreds-of-m/s failure mode
    assert vel.max() < 4.0 * speed, vel.max()
    # the robot actually progressed along the path
    assert float(np.asarray(state.pos)[0, 0]) > -38.0


def test_empty_cavity_marginal_is_empty_f32():
    """The dyn-factor potential marginalised against an empty cavity must
    produce an empty (all-zero) message in f32, not eps-scale noise."""
    sigma, dt = 0.15, 0.143
    inv_s2 = 1.0 / sigma**2
    q11, q12, q22 = 12 * inv_s2 / dt**3, -6 * inv_s2 / dt**2, 4 * inv_s2 / dt
    I2 = np.eye(2)
    qinv = np.block([[q11 * I2, q12 * I2], [q12 * I2, q22 * I2]])
    J = np.block(
        [[I2, dt * I2, -I2, np.zeros((2, 2))],
         [np.zeros((2, 2)), I2, np.zeros((2, 2)), -I2]]
    )
    lam = J.T @ qinv @ J
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    eta0 = jnp.zeros(4, jnp.float32)
    eta_m, lam_m, valid = marginalize_two_block(
        eta0, eta0, f32(lam[:4, :4]), f32(lam[:4, 4:]),
        f32(lam[4:, :4]), f32(lam[4:, 4:]),
    )
    assert not bool(valid)
    assert float(jnp.abs(lam_m).max()) == 0.0
    assert float(jnp.abs(eta_m).max()) == 0.0
