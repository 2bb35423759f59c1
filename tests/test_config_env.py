"""Config/environment/formation parsing + SDF rasterization tests."""

import numpy as np
import pytest

from magics_tpu.config.loader import list_scenarios, load_scenario
from magics_tpu.env import model as M
from magics_tpu.env.sdf import distance_transform, env_to_image, env_to_sdf

REF_SCENARIOS = "/root/reference/config/scenarios"


def test_all_reference_scenarios_parse():
    names = list_scenarios(REF_SCENARIOS)
    assert len(names) >= 18
    for n in names:
        s = load_scenario(f"{REF_SCENARIOS}/{n}")
        assert s.config.simulation.hz > 0
        assert s.environment.nrows >= 1


def test_circle_experiment_values():
    s = load_scenario(f"{REF_SCENARIOS}/Circle Experiment")
    c = s.config
    assert c.simulation.hz == 10.0
    assert c.simulation.prng_seed == 805
    assert c.gbp.iteration_schedule.internal == 50
    assert c.gbp.iteration_schedule.external == 10
    assert c.gbp.sigma_factor_interrobot == 0.005
    assert c.robot.target_speed == 15.0
    assert c.robot.communication.radius == 50.0
    f = s.formations.formations[0]
    assert f.robots == 30
    assert f.initial_shape.kind == "circle"
    assert f.waypoints[0].projection_strategy == "cross"


def test_circle_formation_positions():
    s = load_scenario(f"{REF_SCENARIOS}/Circle Experiment")
    f = s.formations.formations[0]
    rng = np.random.default_rng(0)
    initial, wps = f.as_positions(s.environment.world_size, np.full(30, 2.5), rng)
    assert initial.shape == (30, 2)
    # circle radius 50 centered at origin
    np.testing.assert_allclose(np.linalg.norm(initial, axis=1), 50.0, rtol=1e-6)
    # cross projection = antipodal
    np.testing.assert_allclose(wps[0], -initial, atol=1e-9)


def test_tile_obstacle_pieces():
    # '─' horizontal corridor: obstacle above and below the path band
    env = M.Environment(grid=["─"], tile_size=10.0, path_width=0.5,
                        sdf=M.SdfSettings(resolution=100, expansion=0.0, blur=0.0))
    img = env_to_image(env)
    # obstacle fraction = 1 - path_width
    assert abs((img == 0).mean() - 0.5) < 0.02
    # center row is free
    assert img[50, 50] == 255
    assert img[5, 50] == 0


def test_sdf_blur_range():
    env = M.Environment(grid=["┼"], tile_size=10.0, path_width=0.3,
                        sdf=M.SdfSettings(resolution=64, expansion=0.0, blur=0.1))
    sdf = env_to_sdf(env)
    assert sdf.min() >= 0.0 and sdf.max() <= 1.0
    assert ((sdf > 0.05) & (sdf < 0.95)).any()  # blurred transition band exists


def test_distance_transform():
    ob = np.zeros((32, 32), dtype=bool)
    ob[16, 16] = True
    d = distance_transform(ob, 2.0)
    assert d[16, 16] == 0.0
    assert abs(d[16, 20] - 8.0) < 1e-9


def test_config_toml_roundtrip():
    """config_to_toml must re-emit a document that parses back to the same
    typed Config (save_settings parity, simulation_loader.rs:742-763)."""
    import dataclasses
    from pathlib import Path

    from magics_tpu.config.schema import Config, config_to_toml

    src = Path(REF_SCENARIOS) / "Circle Experiment" / "config.toml"
    cfg = Config.from_file(src)
    text = config_to_toml(cfg)
    cfg2 = Config.from_toml(text)

    def strip_raw(c):
        return dataclasses.replace(c, raw={})

    assert strip_raw(cfg) == strip_raw(cfg2)

    # editing a live value must survive the round trip
    cfg.robot.target_speed = 7.5
    cfg.gbp.iteration_schedule.internal = 13
    cfg3 = Config.from_toml(config_to_toml(cfg))
    assert cfg3.robot.target_speed == 7.5
    assert cfg3.gbp.iteration_schedule.internal == 13
