"""Regression: the tracking-factor corner blend must never hold a variable
that is already PAST a path corner (tracking.rs:255-290, the reference's
own "TODO: FIX THE SWITCHING LOGIC" block).

Observed on Solo GP's RRT* route (final segment 3.3 m, switch-padding 5):
with the blend engaged across the whole short segment, the measurement
point sits behind the corner and the robot parks ~3 m short of its goal
forever. The framework's documented divergence caps the blend window at
half of each adjoining segment and requires the previous-segment
projection to be interior to that segment.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from magics_tpu.graph.factors import tracking_factor_messages


def _run(x_pos, path_pts, record, pad=5.0):
    W = len(path_pts)
    v2f_mu = jnp.array([[[x_pos[0], x_pos[1], 0.0, 0.0]]])  # [1, 1, 4]
    path = jnp.array([path_pts])                            # [1, W, 2]
    path_len = jnp.array([W], dtype=jnp.int32)
    rec = jnp.array([[record]], dtype=jnp.int32)
    idx = jnp.array([W], dtype=jnp.int32)
    timeout = jnp.array([[-1]], dtype=jnp.int32)
    out = tracking_factor_messages(
        v2f_mu, path, path_len, rec, idx, timeout,
        switch_padding=pad, attraction_distance=2.0, sigma=0.15,
    )
    _eta, _lam, _new_rec, _new_to, mp, val, skipped = out
    return np.asarray(mp)[0, 0], float(np.asarray(val)[0, 0]), bool(
        np.asarray(skipped)[0, 0]
    )


# the Solo GP final-approach geometry: long segment into a corner, then a
# 3.3 m final segment (shorter than the 5.0 switch padding)
PATH = [(89.4, 52.56), (103.99, 52.25), (106.25, 49.875)]


def test_variable_past_corner_is_pulled_forward_not_back():
    # variable 0.4 m past the corner, on the final segment
    x = (104.3, 51.95)
    mp, _val, skipped = _run(x, PATH, record=1)
    assert not skipped
    corner = np.array(PATH[1])
    goal = np.array(PATH[2])
    # the measurement point must not sit behind the corner: it must be at
    # least as close to the goal as the variable is
    assert np.linalg.norm(mp - goal) <= np.linalg.norm(np.array(x) - goal) + 1e-5


def test_variable_mid_final_segment_projects_onto_it():
    x = (105.2, 50.6)  # ~halfway down the final segment, slightly off it
    mp, val, skipped = _run(x, PATH, record=1)
    assert not skipped
    # projection stays on the final segment (no blend with the previous
    # one this deep in), so the pull is small and local
    seg = np.array(PATH[2]) - np.array(PATH[1])
    t = np.dot(mp - np.array(PATH[1]), seg) / np.dot(seg, seg)
    assert 0.0 <= t <= 1.0 + 1e-6
    assert val < 0.5


def test_approach_to_corner_still_blends():
    # variable beside the END of the long first segment, short of the
    # corner: the corner-smoothing blend is the desired behavior here
    x = (102.5, 52.8)
    mp, _val, skipped = _run(x, PATH, record=1)
    assert not skipped
    # blended measurement point lies between the two segments' pulls --
    # near the corner, not out on either infinite line
    assert np.linalg.norm(mp - np.array(PATH[1])) < 3.0


def test_projection_clamped_to_segment_not_infinite_line():
    # variable far BEHIND the final segment with record already clamped to
    # it: the reference's infinite-line projection would place mp metres
    # off-path (backward extension); the clamp keeps it at the corner end
    x = (95.0, 52.0)
    mp, val, _skipped = _run(x, PATH, record=1)
    line_start = np.array(PATH[1])
    # mp stays within the segment neighbourhood (start + forward nudge),
    # never on the backward extension (x < corner x by metres)
    assert mp[0] >= line_start[0] - 1e-4
    assert val == 1.0  # saturated pull toward the path, forward
